"""Mapping pipeline semantics (reference migrator.py:827-977, README.md:218
order; FIXTURES.md F6)."""

import pytest

from data_warehouse_migrate_spark.operators.mapping import (
    Mapping,
    MappingError,
    apply_mapping,
    project_to_destination,
    validate_mapping,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "SKU1", "SPU1", "M", "A", None, 2024, 3, "20241226"),
         (2, "SKU2", "SPU2", "L", "B", 1, 2024, None, "20241226")],
        "id int, sku_code string, spu_code string, size string, sku_sabc string, "
        "deleted int, year int, week int, pt string")


def test_full_f6_mapping(df):
    # FIXTURES F6: the production config example end-to-end
    mapping = {
        "exclude": ["pt"],
        "rename": {"sku_code": "sku", "sku_sabc": "sku_grade"},
        "computed": {
            "skc_code": "concat(spu_code, '-', size)",
            "year_week": 'format("{year}-{week:02d}")',
        },
        "defaults": {"deleted": 0},
        "order": ["id", "sku", "skc_code", "deleted", "create_time"],
    }
    out = apply_mapping(df, mapping)
    assert out.columns[:4] == ["id", "sku", "skc_code", "deleted"]
    assert "pt" not in out.columns and "sku_code" not in out.columns
    rows = out.orderBy("id").collect()
    assert [r.skc_code for r in rows] == ["SPU1-M", "SPU2-L"]
    assert [r.year_week for r in rows] == ["2024-03", "2024-00"]  # NULL week → 00
    assert [r.deleted for r in rows] == [0, 1]
    assert [r.sku_grade for r in rows] == ["A", "B"]


def test_include_keeps_listed_order(df):
    out = apply_mapping(df, {"include": ["size", "ID"]})
    assert out.columns == ["size", "id"]  # case-insensitive match, include order


def test_exclude_nonexistent_tolerated(df):
    out = apply_mapping(df, {"exclude": ["nope", "pt"]})
    assert "pt" not in out.columns


def test_include_nonexistent_fails(df):
    with pytest.raises(MappingError):
        apply_mapping(df, {"include": ["ghost"]})


def test_rename_source_missing_fails(df):
    with pytest.raises(MappingError):
        apply_mapping(df, {"rename": {"ghost": "x"}})


def test_rename_duplicate_target_fails(df):
    with pytest.raises(MappingError):
        apply_mapping(df, {"rename": {"sku_code": "x", "spu_code": "X"}})


def test_computed_whitelist_enforced(df):
    with pytest.raises(MappingError):
        apply_mapping(df, {"computed": {"x": "exec(id)"}})


def test_format_validation_unknown_column(df):
    with pytest.raises(MappingError):
        apply_mapping(df, {"computed": {"x": 'format("{ghost:02d}")'}})


def test_format_references_rename_target(df):
    # format may reference rename/computed targets (reference migrator.py:773-821)
    out = apply_mapping(df, {
        "rename": {"sku_code": "sku"},
        "computed": {"tag": 'format("[{sku}]")'},
    })
    assert [r.tag for r in out.orderBy("id").collect()] == ["[SKU1]", "[SKU2]"]


def test_format_positional_arg_count(df):
    with pytest.raises(MappingError):
        validate_mapping(Mapping.from_dict(
            {"computed": {"x": 'format("{}-{}", year)'}}), df.columns)


def test_order_partial_lists_rest_appended(df):
    out = apply_mapping(df, {"order": ["week", "id"]})
    assert out.columns[:2] == ["week", "id"]
    assert set(out.columns) == set(df.columns)


def test_project_to_destination(df):
    out = project_to_destination(df, ["WEEK", "id", "missing_col"])
    assert out.columns == ["WEEK", "id"]


def test_defaults_only_fill_nulls(df):
    out = apply_mapping(df, {"defaults": {"week": 99}})
    assert [r.week for r in out.orderBy("id").collect()] == [3, 99]


def test_rename_target_collision_rejected(spark):
    from data_warehouse_migrate_spark.operators.mapping import (
        Mapping,
        MappingError,
        validate_mapping,
    )
    import pytest

    with pytest.raises(MappingError, match="collide"):
        validate_mapping(Mapping(rename={"id": "name"}), ["id", "name"])
    # renaming BOTH out of the way is fine (swap via disjoint targets)
    validate_mapping(Mapping(rename={"id": "name2"}), ["id", "name"])


def test_format_template_unsupported_spec_fails_preflight(spark):
    from data_warehouse_migrate_spark.operators.mapping import (
        Mapping,
        MappingError,
        validate_mapping,
    )
    import pytest

    with pytest.raises(MappingError, match="bad format template"):
        validate_mapping(
            Mapping(computed={"pad": "format('{code:>8}')"}), ["code"])


def test_incompatible_default_fails_at_apply(spark):
    from data_warehouse_migrate_spark.operators.mapping import (
        Mapping,
        MappingError,
        apply_mapping,
    )
    import pytest

    df = spark.createDataFrame([(1, None)], "id int, qty int")
    with pytest.raises(MappingError, match="not castable"):
        apply_mapping(df, Mapping(defaults={"qty": "n/a"}))
    out = apply_mapping(df, Mapping(defaults={"qty": "7"}))
    assert out.first().qty == 7
