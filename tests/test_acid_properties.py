"""Property-based pins for the round-12 predicate/probe primitives.

These functions sit UNDER correctness gates (a wrong _split_top_and
conjunct = unsound partition pruning; a wrong _canon_probe = a bloom
false negative), so they get hypothesis coverage beyond the
example-based tests.
"""
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_apps_spark.acid import (
    _bloom_pair, _canon_probe, _split_top_and, bloom_may_contain,
    build_bloom)


# ------------------------------------------------------ _split_top_and

_ident = st.sampled_from(["day", "v", "x", "tag"])
_lit = st.one_of(st.integers(-99, 99).map(str),
                 st.sampled_from(["'a'", "'AND'", "'x AND y'",
                                  "'it''s'"]))
_cmp = st.sampled_from(["=", "<", ">", "<=", ">=", "<>"])
_term = st.builds(lambda c, o, l: f"{c} {o} {l}", _ident, _cmp, _lit)
_factor = st.one_of(
    _term,
    st.builds(lambda a, b: f"({a} OR {b})", _term, _term),
    st.builds(lambda a, b: f"({a} AND {b})", _term, _term))


@given(st.lists(_factor, min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_split_top_and_roundtrip(conjs):
    """Joining conjuncts with AND then splitting returns exactly the
    conjuncts — parenthesized ANDs, ORs, and string literals that
    CONTAIN the word AND never split."""
    cond = " AND ".join(conjs)
    assert _split_top_and(cond) == [c.strip() for c in conjs]


def test_split_top_and_edge_cases():
    assert _split_top_and("a = 1") == ["a = 1"]
    # AND inside a string literal is data, not an operator
    assert _split_top_and("tag = 'x AND y' AND v = 1") == \
        ["tag = 'x AND y'", "v = 1"]
    # identifier containing 'and' as a substring never splits
    assert _split_top_and("brand = 2 AND operand < 3") == \
        ["brand = 2", "operand < 3"]
    # escaped quote inside a literal
    assert _split_top_and("tag = 'it''s' AND v = 1") == \
        ["tag = 'it''s'", "v = 1"]
    assert _split_top_and("(a = 1 AND b = 2)") == ["(a = 1 AND b = 2)"]


def test_split_top_and_bare_or_disables_pruning():
    """SQL precedence: 'A OR B AND C' is 'A OR (B AND C)' — the
    fragments between ANDs are NOT conjuncts, so the splitter must
    return [] (prune nothing) on any un-parenthesized depth-0 OR."""
    assert _split_top_and("flag = 1 OR day = 'a' AND day = 'b'") == []
    assert _split_top_and("a = 1 AND b = 2 OR c = 3") == []
    assert _split_top_and("a = 1 OR b = 2") == []
    # parenthesized OR still splits fine
    assert _split_top_and("(a = 1 OR b = 2) AND c = 3") == \
        ["(a = 1 OR b = 2)", "c = 3"]
    # OR inside a string literal is data
    assert _split_top_and("tag = 'x OR y' AND v = 1") == \
        ["tag = 'x OR y'", "v = 1"]
    # identifier containing 'or' as a substring never trips the guard
    assert _split_top_and("ord = 1 AND sponsor = 2") == \
        ["ord = 1", "sponsor = 2"]


@given(st.lists(_factor, min_size=1, max_size=4), _term, _term)
@settings(max_examples=200, deadline=None)
def test_split_top_and_bare_or_property(conjs, a, b):
    """Splicing a bare 'x OR y' term anywhere into an AND chain makes
    the whole predicate non-conjunctive → must return []."""
    parts = list(conjs)
    parts.insert(len(parts) // 2, f"{a} OR {b}")
    assert _split_top_and(" AND ".join(parts)) == []


def test_nonprunable_fn_matches_bare_keywords():
    """Spark accepts current_date / current_timestamp / localtimestamp
    without parens; prune-time vs residual-time evaluation can straddle
    midnight, so the conjunct must be declared non-prunable."""
    from spark_streaming_apps_spark.acid import _NONPRUNABLE_FN
    assert _NONPRUNABLE_FN.search("day < current_date")
    assert _NONPRUNABLE_FN.search("ts < CURRENT_TIMESTAMP")
    assert _NONPRUNABLE_FN.search("ts < localtimestamp")
    assert _NONPRUNABLE_FN.search("day < current_date()")
    assert _NONPRUNABLE_FN.search("rand() < 0.5")
    # plain column names that merely contain the words don't trip it
    assert not _NONPRUNABLE_FN.search("current_dateish = 1")
    assert not _NONPRUNABLE_FN.search("day = '2025-01-01'")
    # rand as a bare identifier (column named rand) is NOT a call
    assert not _NONPRUNABLE_FN.search("rand = 3")


# -------------------------------------------------------- _canon_probe

@given(st.integers(-2**62, 2**62))
@settings(max_examples=200, deadline=None)
def test_canon_probe_int_column_total_on_ints(n):
    from pyspark.sql.types import LongType
    v, ok = _canon_probe(n, LongType())
    assert ok and v == n
    # string spelling of the same integer canonicalizes to it
    v2, ok2 = _canon_probe(str(n), LongType())
    assert ok2 and v2 == n


@given(st.text(max_size=12))
@settings(max_examples=200, deadline=None)
def test_canon_probe_never_lies_on_strings(s):
    """A string probe of an int column is probeable IFF python int()
    accepts it — and then hashing the int agrees with the canonical
    value; anything else must be conservatively unprobeable."""
    from pyspark.sql.types import LongType, StringType
    v, ok = _canon_probe(s, LongType())
    try:
        expect = int(s.strip())
        assert ok and v == expect
    except ValueError:
        assert not ok
    # string column + string probe: always exact, identity
    v2, ok2 = _canon_probe(s, StringType())
    assert ok2 and v2 == s


# ------------------------------------------------------------- bloom

@given(st.lists(st.one_of(st.integers(-2**40, 2**40),
                          st.text(max_size=16)),
                min_size=0, max_size=300))
@settings(max_examples=100, deadline=None)
def test_bloom_no_false_negatives_property(vals):
    buf = build_bloom(vals)
    for v in vals:
        if _bloom_pair(v) is not None:
            assert bloom_may_contain(buf, v), v
    # unsupported probes always conservative
    assert bloom_may_contain(buf, None)
    assert bloom_may_contain(buf, 1.5)
