from faisssearcher_spark.plans.inspect import (
    executed_plan, has_broadcast_join, has_window_group_limit, pushed_filters)

__all__ = ["executed_plan", "has_broadcast_join", "has_window_group_limit",
           "pushed_filters"]
