"""Property-based tests (hypothesis) for the crawl-curation operators:
canonical_url collapse/idempotence on ARBITRARY generated URLs, pack_shards
packing invariants on arbitrary token lists, upsert_latest vs a pure-Python
reference merge, pagerank mass conservation on random digraphs.

Same batching strategy as test_property_parse: examples are drawn in
batches and each batch is one Spark job wherever possible."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shovel_spark.functions.urls import TRACKING_PARAMS, canonical_url
from shovel_spark.operators.graph import pagerank
from shovel_spark.operators.merge import upsert_latest
from shovel_spark.operators.sampling import pack_shards

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=6)
pkey = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=5).filter(
    lambda s: not any(
        s.startswith(p) if p.endswith("_") else s == p or s.startswith(p) for p in TRACKING_PARAMS
    )
)
pval = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789.=", max_size=6)

url_parts = st.tuples(
    st.sampled_from(["http", "https"]),
    st.lists(label, min_size=1, max_size=3),  # host labels
    st.lists(seg, min_size=0, max_size=3),  # path segments
    st.lists(st.tuples(pkey, pval), min_size=0, max_size=4),  # query params
    st.integers(0, 2**31 - 1),  # noise seed
)


def _noisy_variant(scheme, labels, segs, params, rng):
    """One random crawl-noise rendering of the logical URL."""
    host = ".".join(labels)
    host = "".join(c.upper() if rng.random() < 0.5 else c for c in host)
    if rng.random() < 0.3:
        host += ":443" if scheme == "https" else ":80"
    if rng.random() < 0.3:
        host = "user%d@" % rng.randrange(10) + host
    path = "".join("/" + s for s in segs)
    if rng.random() < 0.4:
        path += "/" * rng.randrange(1, 3)
    q = list(params)
    if rng.random() < 0.5:
        q.append(("utm_source", "feed%d" % rng.randrange(10)))
    if rng.random() < 0.3:
        q.append(("fbclid", "x%d" % rng.randrange(10)))
    rng.shuffle(q)
    query = "&".join(f"{k}={v}" if v else k for k, v in q)
    frag = "#frag%d" % rng.randrange(10) if rng.random() < 0.4 else ""
    sch = "".join(c.upper() if rng.random() < 0.5 else c for c in scheme)
    return f"{sch}://{host}{path}" + (f"?{query}" if query else "") + frag


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(url_parts, min_size=1, max_size=25))
def test_canonical_collapses_arbitrary_noise_and_is_idempotent(spark, cases):
    rows = []
    for i, (scheme, labels, segs, params, seed) in enumerate(cases):
        rng = random.Random(seed)
        rows.append((i, _noisy_variant(scheme, labels, segs, params, rng)))
        rows.append((i, _noisy_variant(scheme, labels, segs, params, rng)))
    df = spark.createDataFrame(rows, "i long, u string")
    got = df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    by_i: dict[int, set] = {}
    for r in got:
        by_i.setdefault(r["i"], set()).add(r["c"])
    for i, cs in by_i.items():
        assert len(cs) == 1, f"variants of case {i} did not collapse: {cs}"
        assert None not in cs
    # idempotence: canonicalizing the canonical forms is a no-op
    canon = [(r["i"], r["c"]) for r in got]
    df2 = spark.createDataFrame(canon, "i long, u string")
    again = df2.select("i", canonical_url(F.col("u")).alias("c")).collect()
    assert {(r["i"], r["c"]) for r in again} == set(canon)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(0, 900), min_size=1, max_size=60, unique=True),
    st.integers(1, 300),
)
def test_pack_shards_invariants_arbitrary_tokens(spark, ids, budget):
    rows = [(i, (i * 37) % 473) for i in ids]  # tokens deterministic per id, incl. > budget
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_shards(df, "n_tok", budget=budget, num_buckets=3).collect()
    assert len(out) == len(rows) and len({r["doc_id"] for r in out}) == len(rows)
    max_tok = max(t for _, t in rows)
    per_shard: dict[tuple, int] = {}
    per_bucket: dict[int, set] = {}
    for r in out:
        per_shard[(r["shard_bucket"], r["shard_seq"])] = (
            per_shard.get((r["shard_bucket"], r["shard_seq"]), 0) + r["n_tok"]
        )
        per_bucket.setdefault(r["shard_bucket"], set()).add(r["shard_seq"])
    for tot in per_shard.values():
        assert tot < budget + max_tok + 1
    for seqs in per_bucket.values():
        assert sorted(seqs) == list(range(len(seqs)))  # dense from 0


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5), st.text("ab", min_size=1, max_size=3)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5), st.text("ab", min_size=1, max_size=3)),
        min_size=0,
        max_size=25,
    ),
)
def test_upsert_matches_python_reference(spark, old_rows, new_rows):
    def dedup(rows):  # a snapshot may not carry duplicate keys: keep first
        seen, out = set(), []
        for k, ts, txt in rows:
            if k not in seen:
                seen.add(k)
                out.append((k, ts, txt))
        return out

    old_rows, new_rows = dedup(old_rows), dedup(new_rows)
    old = spark.createDataFrame(old_rows, "k int, ts int, text string")
    new = spark.createDataFrame(new_rows, "k int, ts int, text string")
    got = {r["k"]: (r["ts"], r["text"]) for r in upsert_latest(old, new, "k", "ts").collect()}
    want = {}
    for origin, rows in ((0, old_rows), (1, new_rows)):
        for k, ts, txt in rows:
            cur = want.get(k)
            if cur is None or (ts, origin) > (cur[0], cur[1]):
                want[k] = (ts, origin, txt)
    assert got == {k: (ts, txt) for k, (ts, origin, txt) in want.items()}


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_mass_conserved_on_random_digraphs(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = pagerank(df, iters=2, checkpoint=False).collect()
    n = len({x for e in edges for x in e})
    assert len(ranks) == n
    assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-9
    floor = (1 - 0.85) / n
    assert all(r["rank"] >= floor - 1e-12 for r in ranks)


# --- excise_repeated_spans vs a pure-Python reference on arbitrary corpora --

word = st.sampled_from(["aa", "bb", "cc", "dd"])  # tiny vocab -> dense repeats
doc_text = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus_strategy = st.lists(doc_text, min_size=1, max_size=8)


def _py_excise_ref(texts, k, min_count):
    occ = {}
    toks = {d: t.split() for d, t in enumerate(texts)}
    for d in sorted(toks):
        w = toks[d]
        for i in range(max(len(w) - k + 1, 1)):
            occ.setdefault(" ".join(w[i : i + k]), []).append((d, i))
    cut = {d: set() for d in toks}
    protect = {d: set() for d in toks}
    for h, occs in occ.items():
        if len(occs) < min_count or h == "":
            continue
        first = min(occs)
        for (d, i) in occs:
            (protect if (d, i) == first else cut)[d].update(range(i, i + k))
    return {
        d: " ".join(t for p, t in enumerate(w) if p not in (cut[d] - protect[d]))
        for d, w in toks.items()
    }


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus_strategy, k=st.integers(1, 4), min_count=st.integers(2, 3))
def test_excise_matches_python_reference(spark, corpus, k, min_count):
    """Arbitrary tiny-vocab corpora (dense overlapping repeats, empty docs,
    single-token docs): the distributed excision equals the sequential
    reference policy exactly."""
    from shovel_spark.operators.dedup import excise_repeated_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text
        for r in excise_repeated_spans(df, span_tokens=k, min_count=min_count).collect()
    }
    ref = _py_excise_ref(corpus, k, min_count)
    # the reference normalizes; untouched docs come back byte-identical,
    # which equals the normalized form because inputs are single-spaced
    assert got == ref


# --- funnel_times vs a sequential reference on arbitrary event streams -----

_etype = st.sampled_from(["a", "b", "c"])
_event = st.tuples(st.integers(0, 3), _etype, st.integers(0, 20))  # (user, type, t)
_events_strategy = st.lists(_event, min_size=0, max_size=30)


def _py_funnel(events, steps):
    out = {}
    users = {u for u, _, _ in events}
    for u in users:
        ts = sorted((t, ty) for uu, ty, t in events if uu == u)
        times, prev = [], None
        for step in steps:
            nxt = min(
                (t for t, ty in ts if ty == step and (prev is None or t > prev)),
                default=None,
            )
            times.append(nxt)
            if nxt is None:
                times += [None] * (len(steps) - len(times))
                break
            prev = nxt
        out[u] = tuple(times)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(events=_events_strategy)
def test_funnel_matches_sequential_reference(spark, events):
    """Arbitrary event streams (duplicate timestamps, missing stages,
    interleaved users): the distributed greedy funnel equals the
    sequential per-user walk."""
    from datetime import datetime as dt

    from shovel_spark.operators.windows import funnel_times

    steps = ["a", "b", "c"]
    rows = [(u, ty, dt(2024, 1, 1, 0, t)) for u, ty, t in events]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user_id: (r.t_a, r.t_b, r.t_c)
        for r in funnel_times(df, steps, ["user_id"]).collect()
    }
    ref = {
        u: tuple(None if t is None else dt(2024, 1, 1, 0, t) for t in times)
        for u, times in _py_funnel(events, steps).items()
    }
    assert got == ref
