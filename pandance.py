"""Drop-in import shim: ``import pandance`` → the Spark engine.

A user of the reference (``import pandance; pandance.fuzzy_join(...)``,
reference ``pandance/__init__.py``) can run the same code against
pyspark DataFrames by swapping only the DataFrame type — the function
names, signatures and defaults match (``__all__`` parity with reference
``pandance/pandance.py:17``).
"""

from pandance_spark import (  # noqa: F401
    _estimate_mem_cost_cartesian,
    asof_join,
    fuzzy_join,
    ineq_join,
    theta_join,
)

__version__ = "0.3.0+spark"  # reference API version this tracks

__all__ = [
    "fuzzy_join",
    "theta_join",
    "ineq_join",
    "_estimate_mem_cost_cartesian",
]
