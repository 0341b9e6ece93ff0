from pandance_spark.plans.mem import estimate_mem_cost_cartesian
from pandance_spark.plans.report import assert_scalable, plan_report

__all__ = ["assert_scalable", "estimate_mem_cost_cartesian", "plan_report"]
