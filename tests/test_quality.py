"""Declarative constraint checks (operators/quality.py): per-kind
violation counting, one-scan compilation, and the enforce/quarantine
split."""

from __future__ import annotations

from activedatawarehouseprototype_spark.operators.quality import (
    Constraint,
    check_constraints,
    enforce,
)


def _df(spark):
    rows = [
        (1, "a@x.io", "US", 10.0),
        (2, None, "US", -5.0),        # null email, negative amount
        (3, "bad-email", "ZZ", 50.0),  # regex fail, bad country
        (3, "c@x.io", "DE", 200.0),    # duplicate id, amount > hi
        (4, "d@x.io", "FR", 60.0),
    ]
    return spark.createDataFrame(
        rows, "id bigint, email string, country string, amount double"
    )


CONS = [
    Constraint("email_not_null", "not_null", column="email"),
    Constraint("email_format", "matches_regex", column="email",
               pattern=r"^[^@]+@[^@]+\.[a-z]+$"),
    Constraint("country_known", "accepted_values", column="country",
               values=("US", "DE", "FR")),
    Constraint("amount_range", "in_range", column="amount", lo=0.0, hi=100.0),
    Constraint("amount_positive", "expression", expr="amount > 0"),
    Constraint("id_unique", "unique", keys=("id",)),
]


def test_check_constraints_counts(spark):
    got = {
        r["constraint"]: (r["violations"], r["passed"])
        for r in check_constraints(_df(spark), CONS).collect()
    }
    assert got == {
        "email_not_null": (1, False),
        "email_format": (2, False),   # null + bad-email
        "country_known": (1, False),
        "amount_range": (2, False),   # -5 and 200
        "amount_positive": (1, False),
        "id_unique": (1, False),      # one extra row for id 3
    }
    clean = check_constraints(
        _df(spark).filter("id = 1"), CONS
    )
    assert all(r["passed"] for r in clean.collect())


def test_enforce_quarantines_violating_rows(spark):
    clean, bad = enforce(_df(spark), CONS)
    assert {r.id for r in clean.collect()} == {1, 4}  # fully clean rows
    blamed = {(r.id, tuple(sorted(r.violated))) for r in bad.collect()}
    assert (2, ("amount_positive", "amount_range", "email_not_null",
                "email_format")) not in blamed  # order-insensitive check below
    by_id = {r.id: set(r.violated) for r in bad.collect() if r.id != 3}
    assert by_id[2] == {"email_not_null", "email_format", "amount_range",
                        "amount_positive"}
    # both id-3 rows appear with their own row-level blames
    id3 = [set(r.violated) for r in bad.collect() if r.id == 3]
    assert sorted(id3, key=len) == [{"amount_range"},
                                    {"email_format", "country_known"}]


def test_cli_check_verb(spark, tmp_path, capsys):
    import json as _json

    from activedatawarehouseprototype_spark.cli import main

    data = str(tmp_path / "d.parquet")
    _df(spark).write.parquet(data)
    cons_file = str(tmp_path / "cons.json")
    with open(cons_file, "w") as f:
        _json.dump(
            [
                {"name": "email_not_null", "kind": "not_null",
                 "column": "email"},
                {"name": "id_unique", "kind": "unique", "keys": ["id"]},
                {"name": "amount_range", "kind": "in_range",
                 "column": "amount", "lo": -10.0, "hi": 1000.0},
            ],
            f,
        )
    quarantine = str(tmp_path / "bad")
    capsys.readouterr()
    rc = main(["check", "--input", data, "--constraints", cons_file,
               "--quarantine", quarantine, "--strict"])
    assert rc == 1  # email_not_null and id_unique fail
    report = {
        r["constraint"]: r
        for r in map(_json.loads, capsys.readouterr().out.strip().splitlines())
    }
    assert report["email_not_null"]["violations"] == 1
    assert report["id_unique"]["violations"] == 1
    assert report["amount_range"]["passed"] is True
    bad = spark.read.parquet(quarantine)
    assert {r.id for r in bad.collect()} == {2}  # only the null email row


def test_cli_ingest_verb(spark, tmp_path):
    import json as _json

    from activedatawarehouseprototype_spark.cli import main
    from activedatawarehouseprototype_spark.operators import dedup_index as DI

    corpus = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d tok{i}e") for i in range(10)],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "idx")
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)
    src = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(100, "tok4a tok4b tok4c tok4d tok4e"),    # dup of corpus doc 4
         (101, "new1 new2 new3 new4 new5")],
        "doc_id bigint, text string",
    ).write.parquet(src)
    store = str(tmp_path / "store")
    assert main(["ingest", "--events-dir", src, "--index", idx,
                 "--store", store]) == 0
    got = {r.doc_id for r in spark.read.parquet(f"{store}/docs").collect()}
    assert got == {101}


def test_constraint_declaration_validation(spark):
    import pytest

    from activedatawarehouseprototype_spark.operators.quality import (
        Constraint,
        check_constraints,
    )

    df = _df(spark)
    bad = [
        Constraint("x", "accepted_values", column="country"),      # no values
        Constraint("y", "in_range", column="amount"),              # no bounds
        Constraint("z", "unique"),                                 # no keys
        Constraint("w", "not_a_kind", column="email"),             # bad kind
        Constraint("v", "not_null"),                               # no column
    ]
    for c in bad:
        with pytest.raises(ValueError):
            check_constraints(df, [c])
