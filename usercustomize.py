"""Repo-root usercustomize: transparently substitute the pure-Python
StateMessage codec (terasort_spark/streaming/state_message_shim.py) for
PySpark's generated ``StateMessage_pb2`` when google-protobuf is not
installed, so transformWithStateInPandas works in this container.

Loaded automatically by ``site`` in EVERY Python process whose startup
sys.path contains this directory (set PYTHONPATH=/root/repo — the
session factory exports it so Arrow workers and the driver-side init
runner inherit it). A real protobuf install always wins: the finder is
registered only when ``google.protobuf`` is absent, and it matches
exactly one module name, so nothing else is affected.
"""

import importlib.abc
import importlib.machinery
import importlib.util
import os
import sys

_TARGET = "pyspark.sql.streaming.proto.StateMessage_pb2"
_REPO = os.path.dirname(os.path.abspath(__file__))


class _StateMessageShimFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname != _TARGET:
            return None
        shim = os.path.join(
            _REPO, "terasort_spark", "streaming", "state_message_shim.py"
        )
        if not os.path.isfile(shim):
            return None
        return importlib.util.spec_from_file_location(fullname, shim)


def _have_real_protobuf() -> bool:
    # NOTE: "google" (and even "google.protobuf") can resolve as an
    # EMPTY NAMESPACE package — Spark puts spark-core.jar on the worker
    # PYTHONPATH and the jar's internal google/ resource directory
    # surfaces as a namespace portion. Only the presence of the actual
    # runtime module proves a usable protobuf install.
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except Exception:
        return False


if not _have_real_protobuf():
    sys.meta_path.insert(0, _StateMessageShimFinder())
