"""Property-based validator invariants (SURVEY.md §5.4): for arbitrary
records, ok ∪ ko == input, ok ∩ ko == ∅, every KO row carries >= 1 error,
and every error label corresponds to a check that genuinely fails on that
row.  One hypothesis example = one batch of rows = one Spark job, so the
suite stays fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ominimo_dynamic_data_pipeline_spark.operators.validate import apply_validations

RULES = [
    {"field": "age", "validations": ["notNull", "isNumeric", "min:18", "max:100"]},
    {"field": "plate", "validations": ["notEmpty", "pattern:^[A-Z]{3}-\\d{3}$"]},
    {"field": "start", "validations": ["isDate", "dateBefore:end"]},
]

_age = st.one_of(
    st.none(),
    st.integers(-5, 130).map(str),
    st.sampled_from(["", "abc", "42.5", " 29", "1e2"]),
)
_plate = st.one_of(
    st.none(), st.sampled_from(["", "ABC-123", "XYZ-999", "bad-1", "AB-12"])
)
_date = st.one_of(
    st.none(),
    st.sampled_from(
        ["2024-01-01", "2025-06-30", "not-a-date", "2024-13-45", ""]
    ),
)
_row = st.tuples(_age, _plate, _date, _date)


def _fails(field_value, check, row):
    """Python re-implementation of the null-permissive semantics."""
    v = field_value

    def num(x):
        try:
            return float(x)
        except (TypeError, ValueError):
            return None

    def date_ok(x):
        import datetime

        try:
            datetime.datetime.strptime(x, "%Y-%m-%d")
            return True
        except (TypeError, ValueError):
            return False

    if check == "notNull":
        return v is None
    if check == "notEmpty":
        return v is None or v == ""
    if check == "isNumeric":
        return v is None or num(v) is None
    if check.startswith("min:"):
        n = num(v)
        return v is not None and (n is None or n < float(check[4:]))
    if check.startswith("max:"):
        n = num(v)
        return v is not None and (n is None or n > float(check[4:]))
    if check.startswith("pattern:"):
        import re

        return v is not None and not re.search(check[8:], v)
    if check == "isDate":
        return v is not None and not date_ok(v)
    if check.startswith("dateBefore:"):
        other = row[3]
        if v is None or other is None:
            return False
        if not date_ok(v) or not date_ok(other):
            return True
        return v > other
    raise AssertionError(check)


LABEL_TO_CHECK = {
    "age:must_not_be_null": ("age", "notNull"),
    "age:must_be_numeric": ("age", "isNumeric"),
    "age:must_be_at_least_18.0": ("age", "min:18"),
    "age:must_be_at_most_100.0": ("age", "max:100"),
    "plate:must_be_non_empty": ("plate", "notEmpty"),
    "plate:must_match_pattern": ("plate", "pattern:^[A-Z]{3}-\\d{3}$"),
    "start:must_be_valid_date": ("start", "isDate"),
    "start:must_be_before_end": ("start", "dateBefore:end"),
}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_row, min_size=1, max_size=40))
def test_validator_invariants(spark, rows):
    data = [(i, a, p, s, e) for i, (a, p, s, e) in enumerate(rows)]
    df = spark.createDataFrame(
        data, schema="rid bigint, age string, plate string, start string, end string"
    )
    result = apply_validations(df, RULES)
    ok = result.ok.select("rid").collect()
    ko = result.ko.select("rid", "validation_errors").collect()
    ok_ids = {r["rid"] for r in ok}
    ko_ids = {r["rid"] for r in ko}
    # partition invariants
    assert ok_ids | ko_ids == set(range(len(rows)))
    assert ok_ids & ko_ids == set()
    # every KO row has >= 1 error and each label genuinely fails in Python
    for r in ko:
        assert len(r["validation_errors"]) >= 1
        row = rows[r["rid"]]
        values = {"age": row[0], "plate": row[1], "start": row[2], "end": row[3]}
        for label in r["validation_errors"]:
            field, check = LABEL_TO_CHECK[label]
            assert _fails(values[field], check, row), (label, row)
    # every OK row fails no check
    for rid in ok_ids:
        row = rows[rid]
        values = {"age": row[0], "plate": row[1], "start": row[2], "end": row[3]}
        for label, (field, check) in LABEL_TO_CHECK.items():
            assert not _fails(values[field], check, row), (label, row)
