"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: the reference has no property tests).

Each property pins an operator against an independent oracle over
generated inputs: asof_join vs pandas.merge_asof, GrokParser vs Python
re, ValueTracker vs identity round-trip, exact_dedup invariants.
Spark actions are slow, so examples are kept small and deadlines off.
"""

from __future__ import annotations

import datetime as dt
import re as _re

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(2024, 1, 1)


def _rows(draw_keys, draw_offsets):
    return [(k, _BASE + dt.timedelta(seconds=o)) for k, o in zip(draw_keys, draw_offsets)]


@st.composite
def asof_inputs(draw):
    keys = st.sampled_from(["a", "b", "c"])
    offs = st.integers(min_value=0, max_value=500)
    left = draw(st.lists(st.tuples(keys, offs), min_size=1, max_size=20))
    right = draw(st.lists(st.tuples(keys, offs), min_size=1, max_size=20))
    # right side must be unique per (key, ts) for a deterministic match
    seen = set()
    right = [r for r in right if not (r in seen or seen.add(r))]
    return left, right


@settings(**SETTINGS)
@given(asof_inputs())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    from logstash_integration_jdbc_spark.operators.asof import asof_join

    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, _BASE + dt.timedelta(seconds=o)) for i, (k, o) in enumerate(left_rows)],
        "lid bigint, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _BASE + dt.timedelta(seconds=o), float(o)) for (k, o) in right_rows],
        "key string, ts timestamp, val double",
    )
    got = {r.lid: r.val for r in asof_join(left, right, on="ts", by="key").collect()}

    lpd = pd.DataFrame(
        [(i, k, _BASE + dt.timedelta(seconds=o)) for i, (k, o) in enumerate(left_rows)],
        columns=["lid", "key", "ts"],
    ).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(
        [(k, _BASE + dt.timedelta(seconds=o), float(o)) for (k, o) in right_rows],
        columns=["key", "ts", "val"],
    ).sort_values("ts", kind="stable")
    exp_df = pd.merge_asof(lpd, rpd, on="ts", by="key", direction="backward")
    expected = {
        int(r.lid): (None if pd.isna(r.val) else float(r.val))
        for r in exp_df.itertuples()
    }
    assert got == expected


@settings(**SETTINGS)
@given(st.lists(st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    max_size=60), min_size=1, max_size=20))
def test_grok_parser_matches_python_re(spark, texts):
    from logstash_integration_jdbc_spark.functions.parse import GrokParser

    parser = GrokParser("tool=%{NOTSPACE:tool} n=%{INT:n}", types={"n": "int"})
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r.tool, r.n) for r in parser.apply(df).orderBy("text").collect()]

    rx = _re.compile(r"tool=(\S+) n=([+-]?\d+)")
    expected = []
    for t in sorted(texts):
        m = rx.search(t)
        if m:
            v = int(m.group(2))
            # Spark non-ANSI cast nulls on int32 overflow
            expected.append((m.group(1), v if -2**31 <= v < 2**31 else None))
        else:
            expected.append((None, None))
    assert got == expected


@settings(max_examples=25, deadline=None)
@given(st.one_of(
    st.integers(min_value=0, max_value=2**53),
    st.datetimes(min_value=dt.datetime(1970, 1, 2), max_value=dt.datetime(2100, 1, 1)),
))
def test_value_tracker_round_trips(tmp_path_factory, value):
    from logstash_integration_jdbc_spark.sources.value_tracking import ValueTracker

    path = str(tmp_path_factory.mktemp("vt") / "ckpt.json")
    kind = "timestamp" if isinstance(value, dt.datetime) else "numeric"
    if kind == "timestamp":
        value = value.replace(tzinfo=dt.timezone.utc)
    t = ValueTracker(path=path, tracking_type=kind)
    t.set_value(value)
    t.write()
    back = ValueTracker(path=path, tracking_type=kind)
    assert back.value == value


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["x", "y z", "hello world", ""]),
                min_size=1, max_size=30))
def test_exact_dedup_invariants(spark, texts):
    from logstash_integration_jdbc_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    kept = exact_dedup(df).collect()
    # one representative per distinct text, and it is the min id
    assert len(kept) == len(set(texts))
    first_idx = {}
    for i, t in enumerate(texts):
        first_idx.setdefault(t, i)
    assert sorted(r.doc_id for r in kept) == sorted(first_idx.values())


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    """encode_png → parse_png is the identity on any RGB array."""
    import numpy as np

    from logstash_integration_jdbc_spark.operators.multimodal import (
        encode_png,
        parse_png,
    )

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    got_w, got_h, got = parse_png(encode_png(px))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, px)


# -- BPE: the incremental trainer ≡ a brute re-count-per-round trainer
#    and encode is lossless (token concat reproduces the words) -------------

@st.composite
def word_count_tables(draw):
    words = draw(st.lists(
        st.text(alphabet="abcdef</>", min_size=1, max_size=6),
        min_size=1, max_size=12, unique=True))
    return [(w, draw(st.integers(min_value=1, max_value=9)))
            for w in words]


@given(word_count_tables(), st.integers(min_value=1, max_value=25))
@settings(max_examples=60, deadline=None)
def test_bpe_incremental_matches_brute(counts, k):
    from logstash_integration_jdbc_spark.operators import bpe

    vocab = {tuple(w) + (bpe.EOW,): n for w, n in counts if w}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        nv = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    assert bpe.train_bpe_from_counts(counts, k) == merges

    # encode is lossless: tokens concatenate back to word + EOW
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _n in counts:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + bpe.EOW
