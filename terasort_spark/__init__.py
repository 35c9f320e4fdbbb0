"""terasort_spark — a PySpark-native analytics engine.

Built from scratch on the DataFrame/SQL API (Catalyst + Tungsten do the
physical planning); capabilities per SURVEY.md §2b: the reference's
total-order binary sort pipeline plus a full relational, window,
streaming, UDF, and LLM-data-pipeline operator surface.
"""

from terasort_spark.engine import Engine  # noqa: F401
from terasort_spark.registry import oracle_sql, queries, register  # noqa: F401
from terasort_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
