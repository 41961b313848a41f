from asctb_ct_label_mapper_spark.plans.audit import (
    assert_broadcast_join,
    assert_in_plan,
    assert_not_in_plan,
    assert_pushed_filter,
    formatted_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_in_plan",
    "assert_not_in_plan",
    "assert_pushed_filter",
    "formatted_plan",
]
