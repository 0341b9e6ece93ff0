"""pandance_spark — a PySpark-native analytics engine with the query
capabilities of fburic/pandance (advanced inner joins: fuzzy, theta,
inequality) plus large-scale training-data-pipeline extensions
(deduplication, similarity search, text analysis, multimodal columns).

Everything is expressed as idiomatic Spark DataFrame plans so Catalyst
and Tungsten pick the physical strategy; Python UDFs appear only where
DataFrame ops genuinely cannot express the semantics.

Public API parity with the reference (``pandance/pandance.py:17``,
``__all__ = ['fuzzy_join', 'theta_join', 'ineq_join',
'_estimate_mem_cost_cartesian']``), with Spark DataFrames in place of
pandas DataFrames.
"""

from pandance_spark.operators.asof import asof_join
from pandance_spark.operators.fuzzy import fuzzy_join
from pandance_spark.operators.ineq import ineq_join
from pandance_spark.operators.theta import theta_join
from pandance_spark.plans.mem import estimate_mem_cost_cartesian

# reference-API-parity alias (public by __all__ in the reference)
_estimate_mem_cost_cartesian = estimate_mem_cost_cartesian

__version__ = "0.1.0"

__all__ = [
    "fuzzy_join",
    "theta_join",
    "ineq_join",
    "asof_join",
    "_estimate_mem_cost_cartesian",
    "estimate_mem_cost_cartesian",
]
