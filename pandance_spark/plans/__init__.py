from pandance_spark.plans.mem import estimate_mem_cost_cartesian

__all__ = ["estimate_mem_cost_cartesian"]
