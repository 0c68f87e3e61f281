"""hops_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hopshadoop/hops (see SURVEY.md).

Everything is DataFrame/SQL-first: operators are declared as Catalyst
logical plans and the optimizer picks the physical strategy. The only
Python-side execution is in clearly-marked Pandas-UDF paths (subprocess
pipe bridge, multimodal decode stubs).

Public surface:
    from hops_spark import session, registry
    from hops_spark.ops import agg, join, sort, project, setops, dedup, similarity, text
"""

from hops_spark.session import get_spark, stop_spark  # noqa: F401
from hops_spark.registry import QUERIES, QuerySpec, register  # noqa: F401

__version__ = "0.1.0"
