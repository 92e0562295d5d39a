"""Constraint-aware schema management (schema_constraints.py) —
fingerprint diff, reference-ordered reconcile plan (FK topo drop
order, schema-manager/shared/foreign-keys.go), and Spark validation
jobs as enforcement."""

from __future__ import annotations

import pytest

from neosync_spark.schema_constraints import (
    Constraint,
    ConstraintSet,
    ForeignKey,
    diff_constraints,
    plan_reconcile,
    validate_constraints,
)


def _cs(*cons) -> ConstraintSet:
    cs = ConstraintSet()
    for c in cons:
        cs.add(c)
    return cs


PK_O = Constraint("orders_pk", "orders", "primary_key", ("o_id",))
UQ_C = Constraint("cust_name_uq", "customer", "unique", ("c_name",))
CK_O = Constraint("orders_total_ck", "orders", "check", expr="total >= 0")
FK_OC = ForeignKey("orders_cust_fk", "orders", ("o_cust",), "customer", ("c_id",))
FK_LI = ForeignKey("li_orders_fk", "lineitem", ("l_oid",), "orders", ("o_id",))


class TestDiff:
    def test_create_drop_replace_by_fingerprint(self):
        src = _cs(PK_O, CK_O, FK_OC)
        dst = _cs(
            PK_O,
            Constraint("orders_total_ck", "orders", "check", expr="total > 10"),
            ForeignKey("stale_fk", "orders", ("o_x",), "customer", ("c_id",)),
        )
        d = diff_constraints(src, dst)
        assert [c.name for c in d.create] == ["orders_cust_fk"]
        assert [c.name for c in d.drop] == ["stale_fk"]
        # same name, different expr => drop+recreate
        assert [c.name for c in d.replace] == ["orders_total_ck"]

    def test_noop_when_identical(self):
        src = _cs(PK_O, UQ_C, FK_OC)
        d = diff_constraints(src, _cs(PK_O, UQ_C, FK_OC))
        assert not d.create and not d.drop and not d.replace


class TestPlanOrdering:
    def test_drop_order_non_fk_then_fk_children_first(self):
        # dropping everything: lineitem->orders->customer chain
        dst = _cs(PK_O, UQ_C, FK_OC, FK_LI)
        plan = plan_reconcile(diff_constraints(ConstraintSet(), dst))
        names = [p["name"] for p in plan]
        # non-FK drops first
        assert set(names[:2]) == {"orders_pk", "cust_name_uq"}
        # FK drops: child-most referencing table first (lineitem refs
        # orders, orders refs customer => lineitem's FK drops first)
        assert names[2:] == ["li_orders_fk", "orders_cust_fk"]

    def test_add_order_non_fk_then_fk_parents_first(self):
        src = _cs(PK_O, FK_OC, FK_LI)
        plan = plan_reconcile(diff_constraints(src, ConstraintSet()))
        names = [p["name"] for p in plan]
        assert names[0] == "orders_pk"
        # FK adds: parent-most first (orders' FK to customer before
        # lineitem's FK to orders)
        assert names[1:] == ["orders_cust_fk", "li_orders_fk"]

    def test_column_ops_between_drops_and_adds(self):
        src = _cs(FK_OC)
        dst = _cs(UQ_C)
        plan = plan_reconcile(
            diff_constraints(src, dst),
            column_ops=[{"op": "add_column", "name": "x"}],
        )
        ops = [p["op"] for p in plan]
        assert ops == ["drop_constraint", "add_column", "add_constraint"]

    def test_fk_cycle_forced(self):
        a = ForeignKey("a_b", "ta", ("x",), "tb", ("y",))
        b = ForeignKey("b_a", "tb", ("y",), "ta", ("x",))
        self_ref = ForeignKey("self", "ta", ("p",), "ta", ("q",))
        plan = plan_reconcile(diff_constraints(ConstraintSet(), _cs(a, b, self_ref)))
        names = [p["name"] for p in plan]
        # self-reference drops first; cycle members still present (forced)
        assert names[0] == "self" and set(names) == {"self", "a_b", "b_a"}


class TestValidation:
    def test_counts_per_constraint(self, spark):
        orders = spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, -1.0), (3, 99, 2.0), (3, None, None), (None, 10, 1.0)],
            "o_id int, o_cust int, total double",
        )
        customer = spark.createDataFrame([(10,), (20,)], "c_id int")
        cs = _cs(
            PK_O,
            CK_O,
            Constraint("cust_nn", "orders", "not_null", ("o_cust",)),
            FK_OC,
        )
        got = {
            r["constraint_name"]: r["n_violations"]
            for r in validate_constraints(
                {"orders": orders, "customer": customer}, cs
            ).collect()
        }
        # pk: o_id=3 twice (1 extra) + 1 null row = 2
        assert got["orders_pk"] == 2
        # check: total=-1 violates; NULL total passes (SQL semantics)
        assert got["orders_total_ck"] == 1
        assert got["cust_nn"] == 1
        # fk: o_cust=99 misses; NULL o_cust passes (MATCH SIMPLE)
        assert got["orders_cust_fk"] == 1

    def test_unique_nulls_distinct(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), (None,), (None,)], "c_name string"
        )
        got = validate_constraints({"customer": df}, _cs(UQ_C)).collect()[0]
        assert got["n_violations"] == 1  # dup 'a'; NULLs never collide

    def test_unknown_table_raises(self, spark):
        with pytest.raises(ValueError, match="unknown table"):
            validate_constraints({}, _cs(PK_O))
