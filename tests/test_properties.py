"""Property-based tests (hypothesis) for the pure-Python spec
surfaces: naming/identifier validation, snake_case normalization,
preview LIMIT injection, and the cron evaluator. These are the
boundary-validation layers where a single missed character class
becomes SQL injection or a silent scheduling bug — random inputs
probe them far beyond the hand-picked cases."""

from __future__ import annotations

import re
import string

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from datanika_core_spark.errors import ValidationError
from datanika_core_spark.naming import (
    to_snake_case,
    validate_identifier,
    validate_name,
)
from datanika_core_spark.plans.preview import inject_limit

IDENT_OK = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


@settings(max_examples=300)
@given(st.text(min_size=1, max_size=40))
def test_validate_identifier_accepts_exactly_the_safe_grammar(s):
    """Accepted ⟺ matches the bare-identifier grammar (no hyphen, no
    trailing newline, no unicode letters) — anything else must raise."""
    ok = bool(IDENT_OK.fullmatch(s)) and s.isascii()
    if ok:
        assert validate_identifier(s) == s
    else:
        with pytest.raises(ValidationError):
            validate_identifier(s)


@settings(max_examples=300)
@given(st.text(alphabet=string.ascii_letters + string.digits + " ",
               min_size=1, max_size=40))
def test_name_then_snake_case_yields_valid_identifier_or_raises(s):
    """The reference pipeline: validate_name(upload name) →
    to_snake_case → dataset identifier. Any ACCEPTED name must
    produce a string that is itself a valid identifier, unless it
    collapses to digit-leading/empty (which validate_identifier then
    rejects — never silently splices into DDL)."""
    try:
        validate_name(s)
    except ValidationError:
        return
    snake = to_snake_case(s)
    assert " " not in snake and snake == snake.lower()
    if IDENT_OK.fullmatch(snake):
        assert validate_identifier(snake) == snake
    else:
        with pytest.raises(ValidationError):
            validate_identifier(snake)


@settings(max_examples=200)
@given(st.text(alphabet=string.printable, min_size=1, max_size=120))
def test_inject_limit_idempotent_and_bounded(sql):
    """Injection is idempotent (a second pass never adds another
    LIMIT) and the result always contains exactly one trailing-rule
    outcome: either the original LIMIT is kept or ` LIMIT 5` is
    appended once."""
    assume(sql.strip().rstrip(";").strip())  # degenerate empty SQL
    once = inject_limit(sql)
    twice = inject_limit(once)
    assert twice == once
    assert re.search(r"\bLIMIT\s+\d+", once, re.IGNORECASE)


@settings(max_examples=100)
@given(st.integers(min_value=0, max_value=59),
       st.integers(min_value=0, max_value=23))
def test_cron_pinned_minute_hour_matches_only_that_time(minute, hour):
    from datetime import datetime, timedelta

    from datanika_core_spark.orchestration.scheduler import CronExpr

    cron = CronExpr.parse(f"{minute} {hour} * * *")
    t = datetime(2024, 3, 10, hour, minute)
    assert cron.matches(t)
    assert not cron.matches(t + timedelta(minutes=1))
    assert not cron.matches(t + timedelta(hours=1))
