"""Pure-function tests for the plan-sweep classifier helpers.

The registry-wide funnel sweep (scripts/plan_sweep.py) is enforcing —
exit 1 on undocumented hits — so its toString parsers must not have
silent format blind spots.  ADVICE r10 flagged one: a future Spark that
prints an EMPTY partition spec as a literal ``[]`` would make the
3-bracket-group case look partitioned.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from plan_sweep import _window_is_unpartitioned  # noqa: E402


class TestWindowIsUnpartitioned:
    def test_three_groups_partitioned(self):
        op = (
            "Window [sum(x#1) windowspecdefinition(...) AS s#9], "
            "[k#2], [t#3 ASC NULLS FIRST]"
        )
        assert not _window_is_unpartitioned(op)

    def test_three_groups_empty_partition_spec(self):
        # ADVICE r10: a literal-[] empty partition spec must classify
        # as UNPARTITIONED, not slip through on group count alone.
        op = (
            "Window [sum(x#1) windowspecdefinition(...) AS s#9], "
            "[], [t#3 ASC NULLS FIRST]"
        )
        assert _window_is_unpartitioned(op)

    def test_two_groups_order_only_is_unpartitioned(self):
        op = "Window [row_number() AS r#9], [t#3 ASC NULLS FIRST]"
        assert _window_is_unpartitioned(op)

    def test_two_groups_partition_only_is_partitioned(self):
        # frame-only grouped running sums: [funcs], [part], no order
        op = "Window [sum(x#1) AS s#9], [k#2]"
        assert not _window_is_unpartitioned(op)

    def test_funcs_only_is_unpartitioned(self):
        assert _window_is_unpartitioned("Window [count(1) AS c#9]")

    def test_brackets_inside_parens_ignored(self):
        # bracket groups inside function parens must not count
        op = (
            "Window [collect_list(a#1[0]) AS l#9], [k#2], "
            "[t#3 DESC NULLS LAST]"
        )
        assert not _window_is_unpartitioned(op)
