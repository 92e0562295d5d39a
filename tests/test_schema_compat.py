"""Schema-registry compatibility modes (the Confluent contract mapped
to relational StructTypes): BACKWARD / FORWARD / FULL and transitive
variants enforced at register() time, with Avro-style type promotion.
No reference counterpart (the reference has no registry governance);
semantics follow the public Confluent Schema Registry documentation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from neosync_spark.schema_registry import (
    COMPAT_BACKWARD,
    COMPAT_BACKWARD_TRANSITIVE,
    COMPAT_FORWARD,
    COMPAT_FULL,
    IncompatibleSchemaError,
    SchemaRegistry,
    check_compatibility,
    can_read,
)


def _s(*fields):
    return T.StructType([
        T.StructField(n, t, nullable) for n, t, nullable in fields
    ])


BASE = _s(("id", T.IntegerType(), False), ("v", T.StringType(), True))


class TestPromotion:
    def test_numeric_chain(self):
        assert can_read(T.LongType(), T.IntegerType())
        assert can_read(T.DoubleType(), T.FloatType())
        assert can_read(T.DoubleType(), T.ShortType())
        assert not can_read(T.IntegerType(), T.LongType())
        assert not can_read(T.IntegerType(), T.StringType())

    def test_string_binary_bidirectional(self):
        assert can_read(T.BinaryType(), T.StringType())
        assert can_read(T.StringType(), T.BinaryType())


class TestBackward:
    """New schema must read data written under the old one."""

    def test_nullable_add_and_widening_ok(self):
        new = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
                 ("extra", T.StringType(), True))
        assert check_compatibility(BASE, new, COMPAT_BACKWARD) == []

    def test_non_nullable_add_rejected(self):
        new = _s(("id", T.IntegerType(), False),
                 ("v", T.StringType(), True),
                 ("extra", T.StringType(), False))
        viol = check_compatibility(BASE, new, COMPAT_BACKWARD)
        assert [v["field"] for v in viol] == ["extra"]

    def test_narrowing_rejected(self):
        new = _s(("id", T.ShortType(), False), ("v", T.StringType(), True))
        viol = check_compatibility(BASE, new, COMPAT_BACKWARD)
        assert viol and viol[0]["field"] == "id"

    def test_drop_always_ok(self):
        new = _s(("id", T.IntegerType(), False))
        assert check_compatibility(BASE, new, COMPAT_BACKWARD) == []


class TestForward:
    """Old schema must read data written under the new one."""

    def test_add_ok_old_reader_ignores(self):
        new = _s(("id", T.IntegerType(), False), ("v", T.StringType(), True),
                 ("extra", T.IntegerType(), False))
        assert check_compatibility(BASE, new, COMPAT_FORWARD) == []

    def test_drop_nullable_ok_non_nullable_rejected(self):
        assert check_compatibility(
            BASE, _s(("id", T.IntegerType(), False)), COMPAT_FORWARD
        ) == []
        viol = check_compatibility(
            BASE, _s(("v", T.StringType(), True)), COMPAT_FORWARD
        )
        assert viol and viol[0]["field"] == "id" and viol[0]["rule"] == "forward"

    def test_widening_rejected_narrowing_ok(self):
        # old reader declared int: long values don't fit
        wide = _s(("id", T.LongType(), False), ("v", T.StringType(), True))
        assert check_compatibility(BASE, wide, COMPAT_FORWARD)
        # new writer emitting short: old int reader promotes fine
        narrow = _s(("id", T.ShortType(), False), ("v", T.StringType(), True))
        assert check_compatibility(BASE, narrow, COMPAT_FORWARD) == []


class TestFull:
    def test_only_bidirectional_changes_pass(self):
        # widening breaks forward
        assert check_compatibility(
            BASE, _s(("id", T.LongType(), False), ("v", T.StringType(), True)),
            COMPAT_FULL,
        )
        # string<->binary promotes both ways
        assert check_compatibility(
            BASE, _s(("id", T.IntegerType(), False), ("v", T.BinaryType(), True)),
            COMPAT_FULL,
        ) == []
        # nullable add + nullable drop both fine
        assert check_compatibility(
            BASE,
            _s(("id", T.IntegerType(), False), ("w", T.StringType(), True)),
            COMPAT_FULL,
        ) == []


class TestRenames:
    def test_rename_pairs_fields_for_type_check(self):
        new = _s(("ident", T.LongType(), False), ("v", T.StringType(), True))
        # without the rename map: 'ident' is a non-nullable add -> reject
        assert check_compatibility(BASE, new, COMPAT_BACKWARD)
        # with it: it's the same column widening int->long -> ok
        assert check_compatibility(
            BASE, new, COMPAT_BACKWARD, renames={"ident": "id"}
        ) == []


class TestRegistry:
    def test_register_enforces_and_keeps_versions_clean(self):
        reg = SchemaRegistry(compatibility=COMPAT_BACKWARD)
        reg.register(BASE)
        reg.register(_s(("id", T.LongType(), False),
                        ("v", T.StringType(), True),
                        ("extra", T.StringType(), True)), effective_lsn=100)
        bad = _s(("id", T.IntegerType(), False),  # narrows back
                 ("v", T.StringType(), True),
                 ("extra", T.StringType(), True))
        with pytest.raises(IncompatibleSchemaError) as ei:
            reg.register(bad, effective_lsn=200)
        assert ei.value.violations[0]["field"] == "id"
        assert len(reg.versions) == 2  # rejected version never lands

    def test_transitive_checks_all_priors(self):
        # v1 has 'flag' as int (non-null); v2 drops it; v3 re-adds it
        # as a nullable STRING — fine vs v2 (plain add), but an int
        # column can't be read as string vs v1's data
        v1 = _s(("id", T.IntegerType(), False), ("flag", T.IntegerType(), False))
        v2 = _s(("id", T.IntegerType(), False))
        v3 = _s(("id", T.IntegerType(), False), ("flag", T.StringType(), True))

        plain = SchemaRegistry(compatibility=COMPAT_BACKWARD)
        plain.register(v1)
        plain.register(v2)
        plain.register(v3)  # non-transitive: only vs v2 -> passes
        assert len(plain.versions) == 3

        trans = SchemaRegistry(compatibility=COMPAT_BACKWARD_TRANSITIVE)
        trans.register(v1)
        trans.register(v2)
        with pytest.raises(IncompatibleSchemaError) as ei:
            trans.register(v3)
        assert ei.value.violations[0]["field"] == "flag"

    def test_transitive_composes_rename_maps(self):
        # v1: a int -> v2 renames a->b (widens to long) -> v3 renames
        # b->c as double: transitively still the same column, every
        # hop a promotion — accepted
        v1 = _s(("a", T.IntegerType(), False))
        v2 = _s(("b", T.LongType(), False))
        v3 = _s(("c", T.DoubleType(), False))
        reg = SchemaRegistry(compatibility=COMPAT_BACKWARD_TRANSITIVE)
        reg.register(v1)
        reg.register(v2, renames={"b": "a"})
        reg.register(v3, renames={"c": "b"})
        assert len(reg.versions) == 3

    def test_none_mode_accepts_anything(self):
        reg = SchemaRegistry()
        reg.register(BASE)
        reg.register(_s(("totally", T.BinaryType(), False)))
        assert len(reg.versions) == 2
