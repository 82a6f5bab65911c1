"""rearview_spark — a PySpark-native analytics engine with the capability
surface of livingsocial/rearview (timeseries monitoring: Graphite render
semantics, monitor evaluation, alert lifecycle) plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design stance (SURVEY.md §7): batch/stream-unified DataFrames over a tall
``(metric, ts, value)`` timeseries table; Catalyst does all relational
optimization; our code is (a) a Graphite-expression front-end that *emits*
DataFrame plans, (b) a library of named DataFrame→DataFrame transforms,
(c) pandas-UDF monitor evaluation, (d) a thin stateful alert loop.
"""

from rearview_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
