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
