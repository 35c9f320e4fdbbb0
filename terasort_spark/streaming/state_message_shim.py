"""Pure-Python stand-in for PySpark's generated
``pyspark.sql.streaming.proto.StateMessage_pb2`` module.

PySpark 4's transformWithStateInPandas talks to the JVM state server
over a socket carrying proto3-encoded ``StateMessage`` frames. The
generated module needs the google-protobuf runtime, which this
container does not ship; everything else about the operator works. This
module implements the SAME message set (names, field numbers, wire
types transcribed from Spark's public
``org/apache/spark/sql/execution/streaming/StateMessage.proto`` — the
serialized FileDescriptor embedded in the bundled StateMessage_pb2.py)
on a ~150-line proto3 wire codec, exposing exactly the surface the
bundled state clients use: kwargs construction, attribute assignment
with sub-message auto-vivification, ``SerializeToString`` /
``ParseFromString``, repeated fields as lists, and the HandleState
enum constants.

Installed lazily by the repo-root ``usercustomize.py`` import hook in
every Python process (driver, Arrow workers, the driver-side init
runner) ONLY when ``google.protobuf`` is absent, so a real protobuf
install always wins.

proto3 semantics honored here (the subset the protocol exercises):
- scalars serialize only when != their zero default;
- message fields serialize when explicitly passed (even empty — oneof
  case selection relies on the tag) or when auto-vivified AND
  non-empty (``cmd.ttl.durationMs = 5``);
- unknown fields on parse are skipped by wire type;
- int64 fields decode sign-extended from 64-bit varints.
"""

from __future__ import annotations

# --- wire codec -----------------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement 64-bit, per proto int32/int64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


class Field:
    __slots__ = ("num", "kind", "repeated", "msg")

    def __init__(self, num, kind, repeated=False, msg=None):
        self.num, self.kind = num, kind
        self.repeated, self.msg = repeated, msg

    def default(self):
        if self.repeated:
            return []
        return {
            "int": 0,
            "bool": False,
            "enum": 0,
            "str": "",
            "bytes": b"",
            "msg": None,
        }[self.kind]


# --- message base ---------------------------------------------------------


class _Message:
    _FIELDS: dict  # name -> Field, set by subclass

    def __init__(self, **kwargs):
        object.__setattr__(self, "_explicit", set())
        for name, f in self._FIELDS.items():
            object.__setattr__(self, name, f.default())
        for name, val in kwargs.items():
            if name not in self._FIELDS:
                raise ValueError(f"{type(self).__name__} has no field {name}")
            if val is not None:
                setattr(self, name, val)

    def __setattr__(self, name, val):
        if name in self._FIELDS:
            self._explicit.add(name)
        object.__setattr__(self, name, val)

    def __getattr__(self, name):
        # only called when the attribute is missing — auto-vivify
        # sub-messages so `cmd.ttl.durationMs = 5` works
        raise AttributeError(name)  # pragma: no cover (all pre-set)

    def __getattribute__(self, name):
        val = object.__getattribute__(self, name)
        if val is None:
            f = type(self)._FIELDS.get(name)
            if f is not None and f.kind == "msg" and not f.repeated:
                val = f.msg()
                object.__setattr__(self, name, val)
        return val

    # -- encode --
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for name, f in self._FIELDS.items():
            val = object.__getattribute__(self, name)
            if f.repeated:
                for item in val:
                    self._emit(out, f, item)
            elif f.kind == "msg":
                if val is None:
                    continue
                enc = val.SerializeToString()
                # explicitly-passed messages always serialize (oneof
                # selection); auto-vivified ones only when non-empty
                if name in self._explicit or enc:
                    out += _varint((f.num << 3) | 2) + _varint(len(enc)) + enc
            else:
                if val != f.default():
                    self._emit(out, f, val)
        return bytes(out)

    @staticmethod
    def _emit(out: bytearray, f: Field, val) -> None:
        if f.kind in ("int", "enum"):
            out += _varint((f.num << 3) | 0) + _varint(int(val))
        elif f.kind == "bool":
            out += _varint((f.num << 3) | 0) + _varint(1 if val else 0)
        elif f.kind == "str":
            b = val.encode("utf-8")
            out += _varint((f.num << 3) | 2) + _varint(len(b)) + b
        elif f.kind == "bytes":
            out += _varint((f.num << 3) | 2) + _varint(len(val)) + bytes(val)
        elif f.kind == "msg":
            enc = val.SerializeToString()
            out += _varint((f.num << 3) | 2) + _varint(len(enc)) + enc
        else:  # pragma: no cover
            raise TypeError(f.kind)

    # -- decode --
    def ParseFromString(self, data: bytes) -> None:
        self.__init__()
        by_num = {f.num: (n, f) for n, f in self._FIELDS.items()}
        i, n = 0, len(data)
        while i < n:
            key, i = _read_varint(data, i)
            num, wt = key >> 3, key & 7
            if wt == 0:
                raw, i = _read_varint(data, i)
                payload = raw
            elif wt == 2:
                ln, i = _read_varint(data, i)
                payload = data[i : i + ln]
                i += ln
            elif wt == 5:  # pragma: no cover (no fixed32 in this proto)
                payload, i = data[i : i + 4], i + 4
            elif wt == 1:  # pragma: no cover (no fixed64 in this proto)
                payload, i = data[i : i + 8], i + 8
            else:  # pragma: no cover
                raise ValueError(f"unsupported wire type {wt}")
            if num not in by_num:
                continue  # unknown field: skip
            name, f = by_num[num]
            if f.kind == "int":
                val = _signed64(payload)
            elif f.kind in ("enum",):
                val = payload
            elif f.kind == "bool":
                val = bool(payload)
            elif f.kind == "str":
                val = payload.decode("utf-8")
            elif f.kind == "bytes":
                val = bytes(payload)
            else:  # msg
                val = f.msg()
                val.ParseFromString(payload)
            if f.repeated:
                object.__getattribute__(self, name).append(val)
            else:
                setattr(self, name, val)

    def __repr__(self):  # debugging aid
        parts = ", ".join(
            f"{n}={object.__getattribute__(self, n)!r}"
            for n in self._FIELDS
            if object.__getattribute__(self, n) not in (None, [], 0, "", b"", False)
        )
        return f"{type(self).__name__}({parts})"


def _msg(name: str, **fields) -> type:
    cls = type(name, (_Message,), {"_FIELDS": fields})
    globals()[name] = cls
    return cls


# --- HandleState enum (top-level, as generated code exposes it) -----------

PRE_INIT = 0
CREATED = 1
INITIALIZED = 2
DATA_PROCESSED = 3
TIMER_PROCESSED = 4
CLOSED = 5


# --- message definitions (field numbers from StateMessage.proto) ----------

_msg("Exists")
_msg("Get")
_msg("Clear")
_msg("RemoveImplicitKey")
_msg("GetProcessingTime")
_msg("GetWatermark")

_msg("SetHandleState", state=Field(1, "enum"))
_msg("TTLConfig", durationMs=Field(1, "int"))
_msg("SetImplicitKey", key=Field(1, "bytes"))
_msg("ValueStateUpdate", value=Field(1, "bytes"))
_msg("RegisterTimer", expiryTimestampMs=Field(1, "int"))
_msg("DeleteTimer", expiryTimestampMs=Field(1, "int"))
_msg("ListTimers", iteratorId=Field(1, "str"))
_msg("ListStateGet", iteratorId=Field(1, "str"))
_msg(
    "ListStatePut",
    value=Field(1, "bytes", repeated=True),
    fetchWithArrow=Field(2, "bool"),
)
_msg("AppendValue", value=Field(1, "bytes"))
_msg(
    "AppendList",
    value=Field(1, "bytes", repeated=True),
    fetchWithArrow=Field(2, "bool"),
)
_msg("GetValue", userKey=Field(1, "bytes"))
_msg("ContainsKey", userKey=Field(1, "bytes"))
_msg("UpdateValue", userKey=Field(1, "bytes"), value=Field(2, "bytes"))
_msg("Iterator", iteratorId=Field(1, "str"))
_msg("Keys", iteratorId=Field(1, "str"))
_msg("Values", iteratorId=Field(1, "str"))
_msg("RemoveKey", userKey=Field(1, "bytes"))
_msg("ParseStringSchema", schema=Field(1, "str"))
_msg(
    "ExpiryTimerRequest",
    iteratorId=Field(1, "str"),
    expiryTimestampMs=Field(2, "int"),
)

_msg(
    "StateCallCommand",
    stateName=Field(1, "str"),
    schema=Field(2, "str"),
    mapStateValueSchema=Field(3, "str"),
    ttl=Field(4, "msg", msg=TTLConfig),  # noqa: F821
)
_msg(
    "TimerStateCallCommand",
    register=Field(1, "msg", msg=RegisterTimer),  # noqa: F821
    delete=Field(2, "msg", msg=DeleteTimer),  # noqa: F821
    list=Field(3, "msg", msg=ListTimers),  # noqa: F821
)
_msg(
    "ValueStateCall",
    stateName=Field(1, "str"),
    exists=Field(2, "msg", msg=Exists),  # noqa: F821
    get=Field(3, "msg", msg=Get),  # noqa: F821
    valueStateUpdate=Field(4, "msg", msg=ValueStateUpdate),  # noqa: F821
    clear=Field(5, "msg", msg=Clear),  # noqa: F821
)
_msg(
    "ListStateCall",
    stateName=Field(1, "str"),
    exists=Field(2, "msg", msg=Exists),  # noqa: F821
    listStateGet=Field(3, "msg", msg=ListStateGet),  # noqa: F821
    listStatePut=Field(4, "msg", msg=ListStatePut),  # noqa: F821
    appendValue=Field(5, "msg", msg=AppendValue),  # noqa: F821
    appendList=Field(6, "msg", msg=AppendList),  # noqa: F821
    clear=Field(7, "msg", msg=Clear),  # noqa: F821
)
_msg(
    "MapStateCall",
    stateName=Field(1, "str"),
    exists=Field(2, "msg", msg=Exists),  # noqa: F821
    getValue=Field(3, "msg", msg=GetValue),  # noqa: F821
    containsKey=Field(4, "msg", msg=ContainsKey),  # noqa: F821
    updateValue=Field(5, "msg", msg=UpdateValue),  # noqa: F821
    iterator=Field(6, "msg", msg=Iterator),  # noqa: F821
    keys=Field(7, "msg", msg=Keys),  # noqa: F821
    values=Field(8, "msg", msg=Values),  # noqa: F821
    removeKey=Field(9, "msg", msg=RemoveKey),  # noqa: F821
    clear=Field(10, "msg", msg=Clear),  # noqa: F821
)
_msg(
    "StatefulProcessorCall",
    setHandleState=Field(1, "msg", msg=SetHandleState),  # noqa: F821
    getValueState=Field(2, "msg", msg=StateCallCommand),  # noqa: F821
    getListState=Field(3, "msg", msg=StateCallCommand),  # noqa: F821
    getMapState=Field(4, "msg", msg=StateCallCommand),  # noqa: F821
    timerStateCall=Field(5, "msg", msg=TimerStateCallCommand),  # noqa: F821
    deleteIfExists=Field(6, "msg", msg=StateCallCommand),  # noqa: F821
)
_msg(
    "StateVariableRequest",
    valueStateCall=Field(1, "msg", msg=ValueStateCall),  # noqa: F821
    listStateCall=Field(2, "msg", msg=ListStateCall),  # noqa: F821
    mapStateCall=Field(3, "msg", msg=MapStateCall),  # noqa: F821
)
_msg(
    "ImplicitGroupingKeyRequest",
    setImplicitKey=Field(1, "msg", msg=SetImplicitKey),  # noqa: F821
    removeImplicitKey=Field(2, "msg", msg=RemoveImplicitKey),  # noqa: F821
)
_msg(
    "TimerValueRequest",
    getProcessingTimer=Field(1, "msg", msg=GetProcessingTime),  # noqa: F821
    getWatermark=Field(2, "msg", msg=GetWatermark),  # noqa: F821
)
_msg(
    "TimerRequest",
    timerValueRequest=Field(1, "msg", msg=TimerValueRequest),  # noqa: F821
    expiryTimerRequest=Field(2, "msg", msg=ExpiryTimerRequest),  # noqa: F821
)
_msg(
    "UtilsRequest",
    parseStringSchema=Field(1, "msg", msg=ParseStringSchema),  # noqa: F821
)
_msg(
    "StateRequest",
    version=Field(1, "int"),
    statefulProcessorCall=Field(2, "msg", msg=StatefulProcessorCall),  # noqa: F821
    stateVariableRequest=Field(3, "msg", msg=StateVariableRequest),  # noqa: F821
    implicitGroupingKeyRequest=Field(
        4, "msg", msg=ImplicitGroupingKeyRequest  # noqa: F821
    ),
    timerRequest=Field(5, "msg", msg=TimerRequest),  # noqa: F821
    utilsRequest=Field(6, "msg", msg=UtilsRequest),  # noqa: F821
)

_msg(
    "StateResponse",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    value=Field(3, "bytes"),
)
_msg(
    "StateResponseWithLongTypeVal",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    value=Field(3, "int"),
)
_msg(
    "StateResponseWithStringTypeVal",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    value=Field(3, "str"),
)
_msg(
    "StateResponseWithListGet",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    value=Field(3, "bytes", repeated=True),
    requireNextFetch=Field(4, "bool"),
)
_msg(
    "StateResponseWithMapKeysOrValues",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    value=Field(3, "bytes", repeated=True),
    requireNextFetch=Field(4, "bool"),
)
_msg("KeyAndValuePair", key=Field(1, "bytes"), value=Field(2, "bytes"))
_msg(
    "StateResponseWithMapIterator",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    kvPair=Field(3, "msg", msg=KeyAndValuePair, repeated=True),  # noqa: F821
    requireNextFetch=Field(4, "bool"),
)
_msg("TimerInfo", key=Field(1, "bytes"), timestampMs=Field(2, "int"))
_msg(
    "StateResponseWithTimer",
    statusCode=Field(1, "int"),
    errorMessage=Field(2, "str"),
    timer=Field(3, "msg", msg=TimerInfo, repeated=True),  # noqa: F821
    requireNextFetch=Field(4, "bool"),
)
