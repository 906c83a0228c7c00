"""Physical-plan introspection (SURVEY §4)."""

from .checks import (  # noqa: F401
    assert_broadcast_join,
    assert_no_rowwise_python,
    assert_pushed_filters,
    assert_wholestage_codegen,
    physical_plan,
)
