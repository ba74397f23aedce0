"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: it had none): random-input equivalence of the
derivation-DSL compiler against direct Python evaluation, and of the
as-of join against pandas.merge_asof."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


# --- derivation DSL: random expression trees --------------------------------

def _formula(depth: int) -> st.SearchStrategy:
    leaf = st.sampled_from(["'a'", "'b'", "'c'", "2", "10", "0.5"])
    if depth == 0:
        return leaf
    sub = _formula(depth - 1)
    binop = st.sampled_from(["mul", "sum", "sub", "min", "max"])
    return st.one_of(
        leaf,
        st.tuples(binop, sub, sub).map(lambda t: f"{t[0]}({t[1]},{t[2]})"),
        sub.map(lambda x: f"abs({x})"),
        sub.map(lambda x: f"neg({x})"),
    )


def _py_eval(node: str, env: dict[str, float]) -> float:
    node = node.strip()
    if node.startswith("'"):
        return env[node.strip("'")]
    if "(" not in node:
        return float(node)
    fn, rest = node.split("(", 1)
    body = rest[:-1]
    args, depth, cur = [], 0, ""
    for ch in body:
        if ch == "," and depth == 0:
            args.append(cur)
            cur = ""
        else:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            cur += ch
    args.append(cur)
    vals = [_py_eval(a, env) for a in args]
    return {
        "mul": lambda v: v[0] * v[1],
        "sum": lambda v: v[0] + v[1],
        "sub": lambda v: v[0] - v[1],
        "min": lambda v: min(v),
        "max": lambda v: max(v),
        "abs": lambda v: abs(v[0]),
        "neg": lambda v: -v[0],
    }[fn](vals)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(formula=_formula(3), a=finite, b=finite, c=finite)
def test_derivation_matches_python(spark, formula, a, b, c):
    from impc_etl_spark.operators.derivation import compile_derivation

    df = spark.createDataFrame([(a, b, c)], ["a", "b", "c"])
    got = df.select(compile_derivation(formula).cast("double").alias("x")).collect()[0]["x"]
    want = _py_eval(formula, {"a": a, "b": b, "c": c})
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


# --- as-of join vs pandas.merge_asof ----------------------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lts=st.lists(st.integers(0, 300), min_size=1, max_size=12, unique=True),
    rts=st.lists(st.integers(0, 300), min_size=1, max_size=12, unique=True),
    keys=st.lists(st.integers(0, 2), min_size=1, max_size=12),
)
def test_asof_backward_matches_pandas(spark, lts, rts, keys):
    from impc_etl_spark.operators.joins import asof_join

    left_rows = [(keys[i % len(keys)], t) for i, t in enumerate(sorted(lts))]
    right_rows = [(keys[(i + 1) % len(keys)], t) for i, t in enumerate(sorted(rts))]
    left = spark.createDataFrame(left_rows, ["k", "t"])
    right = spark.createDataFrame(right_rows, ["k", "rt"])
    out = asof_join(left, right, on=["k"], left_time="t", right_time="rt",
                    direction="backward")
    got = {(r["k"], r["t"]): r["rt"] for r in out.collect()}

    lp = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rt"]).sort_values("rt")
    merged = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                           direction="backward")
    want = {
        (r.k, r.t): (None if pd.isna(r.rt) else int(r.rt))
        for r in merged.itertuples()
    }
    assert got == want


# --- connected components vs a reference union-find -------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    from impc_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["group_id"] for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


# --- sequence packing invariants --------------------------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(1, 700), min_size=1, max_size=30))
def test_pack_sequences_invariants(spark, counts):
    from impc_etl_spark.operators.text import pack_sequences

    budget = 512
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(df, "n_tokens", budget).collect()
    assert sum(r["n_tokens"] for r in out) == sum(counts)   # nothing lost
    by_pack: dict[int, list] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    pack_ids = sorted(by_pack)
    assert pack_ids[0] == 0
    # pack ids are contiguous and, before its last doc, a pack is under budget
    for pid in pack_ids:
        assert sum(by_pack[pid][:-1]) < budget


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(1, 700), min_size=1, max_size=30))
def test_pack_sequences_sharded_invariants(spark, counts):
    """The sharded form preserves the packing invariants WITHIN each shard
    and equals the global form applied per-shard (packs never span shards)."""
    from impc_etl_spark.operators.text import pack_sequences

    budget = 512
    rows = [(i, i % 3, n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    out = pack_sequences(
        df, "n_tokens", budget, partition_keys=["shard"]
    ).collect()
    assert sum(r["n_tokens"] for r in out) == sum(counts)   # nothing lost
    by_pack: dict[str, list] = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        assert r["pack_id"].startswith(f"{r['shard']}-")    # packs don't span shards
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for pid, sizes in by_pack.items():
        assert sum(sizes[:-1]) < budget
    # each shard's packing starts at local id 0 (ids may skip after an
    # over-budget doc, exactly like the global form)
    for shard in {r["shard"] for r in out}:
        locals_ = sorted(
            int(p.split("-")[1]) for p in by_pack if p.startswith(f"{shard}-")
        )
        assert locals_[0] == 0


# --- subset-containment join vs Python set logic ----------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lefts=st.lists(st.lists(st.sampled_from("abcdef"), max_size=5),
                   min_size=1, max_size=8),
    rights=st.lists(st.lists(st.sampled_from("abcdef"), max_size=4),
                    min_size=1, max_size=6),
)
def test_subset_join_matches_python_reference(spark, lefts, rights):
    """Both strategies equal the reference condition evaluated in Python:
    match iff |set(l) ∩ set(r)| == len(r) (duplicates in r never match,
    empty r under 'broadcast' matches everything)."""
    from impc_etl_spark.operators.joins import subset_join

    left = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(lefts)],
        "lid int, larr array<string>",
    )
    right = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(rights)],
        "rid int, rarr array<string>",
    )
    want = {
        (li, ri)
        for li, larr in enumerate(lefts)
        for ri, rarr in enumerate(rights)
        if len(set(larr) & set(rarr)) == len(rarr)
    }
    got_b = {
        (r["lid"], r["rid"])
        for r in subset_join(left, right, "larr", "rarr", "lid", "rid",
                             strategy="broadcast").collect()
    }
    assert got_b == want
    # explode path: identical except empty right arrays never match
    want_e = {(li, ri) for li, ri in want if len(rights[ri]) > 0}
    got_e = {
        (r["lid"], r["rid"])
        for r in subset_join(left, right, "larr", "rarr", "lid", "rid",
                             strategy="explode").collect()
    }
    assert got_e == want_e


# --- struct-array merge vs the reference algorithm --------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    arrs=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)), max_size=5),
        ),
        min_size=1, max_size=6,
    ),
    upds=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.tuples(st.integers(0, 5), st.integers(100, 199)), max_size=5),
        ),
        min_size=1, max_size=6,
    ),
)
def test_merge_struct_array_matches_reference_random(spark, arrs, upds):
    from impc_etl_spark.operators.derivation import merge_struct_array

    def ref_merge(existing, updates):
        if updates is None or existing is None:
            return updates if existing is None else existing
        upd_by_key = {u[0]: u for u in updates}
        out = [upd_by_key.get(e[0], e) for e in existing]
        seen = {e[0] for e in existing}
        out += [u for u in updates if u[0] not in seen]
        return out

    n = min(len(arrs), len(upds))
    cases = list(zip(arrs[:n], upds[:n]))
    df = spark.createDataFrame(
        [(i, a, u) for i, (a, u) in enumerate(cases)],
        "id int, arr array<struct<pid:int,val:int>>, upd array<struct<pid:int,val:int>>",
    )
    got = {
        r["id"]: (None if r["m"] is None else [(e["pid"], e["val"]) for e in r["m"]])
        for r in df.select(
            "id", merge_struct_array(F.col("arr"), F.col("upd"), "pid").alias("m")
        ).collect()
    }
    for i, (a, u) in enumerate(cases):
        want = ref_merge(list(a) if a is not None else None,
                         list(u) if u is not None else None)
        assert got[i] == want, (i, a, u, got[i], want)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=8
    ),
    size=st.integers(min_value=1, max_value=6),
    overlap=st.integers(min_value=0, max_value=5),
)
def test_chunk_text_invariants(spark, texts, size, overlap):
    """Disjoint-mode chunks concatenate back to the token stream; strided
    chunks start exactly stride apart and tile every token."""
    from impc_etl_spark.operators.text import chunk_text, tokens

    stride = max(1, size - overlap)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    toks = {
        r.doc_id: r.t
        for r in df.select("doc_id", tokens("text").alias("t")).collect()
    }
    rows = chunk_text(df, "text", size=size, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, t in toks.items():
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not t:
            assert got == []
            continue
        # chunk i covers tokens [i*stride, i*stride+size)
        for i, r in enumerate(got):
            assert r.chunk_id == i
            expect = t[i * stride : i * stride + size]
            assert r.chunk_text.split(" ") == expect
            assert r.n_chunk_tokens == len(expect)
        # tiling: last chunk reaches the end of the token stream
        assert (len(got) - 1) * stride + got[-1].n_chunk_tokens == len(t)


# --- collapse_repeats: random token sequences vs Python reference -----------

@given(
    seqs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_collapse_repeats_matches_python(spark, seqs):
    from impc_etl_spark.operators.text import collapse_repeats

    def py_collapse(toks):
        out = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        return " ".join(out)

    rows = [(i, " ".join(toks)) for i, toks in enumerate(seqs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["clean_text"] for r in collapse_repeats(df).collect()}
    for i, toks in enumerate(seqs):
        assert got[i] == py_collapse(toks), (toks, got[i])
        # idempotence: collapsing clean text changes nothing
    df2 = spark.createDataFrame(
        [(i, v) for i, v in got.items()], ["doc_id", "text"]
    )
    again = {r["doc_id"]: r["clean_text"] for r in collapse_repeats(df2).collect()}
    assert again == got


# --- dup_spans: invariants + Python reference -------------------------------

@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dup_spans_matches_python(spark, docs, k):
    from collections import Counter, defaultdict

    from impc_etl_spark.operators.dedup import dup_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"])
        for r in dup_spans(df, k=k, min_docs=2).collect()
    }

    spans_by_doc = {
        i: [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        for i, toks in enumerate(docs)
    }
    docs_per_span = defaultdict(set)
    for i, spans in spans_by_doc.items():
        for s in spans:
            docs_per_span[s].add(i)
    want = {}
    for i, spans in spans_by_doc.items():
        if not spans:
            continue
        c = Counter(spans)
        dup = sum(n for s, n in c.items() if len(docs_per_span[s]) >= 2)
        want[i] = (len(spans), dup)
    assert got == want


# --- SCD2 / CDC history operators vs python replays -------------------------

@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),           # key
            st.integers(0, 20),          # ts
            st.sampled_from(["A", "B", None]),  # attr (nullable)
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_scd2_matches_python_replay(spark, events):
    from impc_etl_spark.operators.history import scd2_build

    # unique (key, ts, attr) triples may still collide on (key, ts) —
    # add a per-row seq as the deterministic tiebreak
    rows = [(k, t, a, i) for i, (k, t, a) in enumerate(events)]
    df = spark.createDataFrame(rows, "k int, ts int, a string, seq int")
    got = sorted(
        (
            (r["k"], r["valid_from"], r["a"], r["valid_to"], r["is_current"])
            for r in scd2_build(
                df, ["k"], "ts", ["a"], tiebreak_cols=["seq"]
            ).collect()
        ),
        key=repr,
    )

    want = []
    bykey: dict[int, list] = {}
    for k, t, a, i in rows:
        bykey.setdefault(k, []).append((t, i, a))
    for k, evs in bykey.items():
        evs.sort()
        versions = []
        prev = object()
        for t, _i, a in evs:
            if a != prev:
                versions.append([t, a])
                prev = a
        for j, (t, a) in enumerate(versions):
            vt = versions[j + 1][0] if j + 1 < len(versions) else None
            want.append((k, t, a, vt, vt is None))
    assert got == sorted(want, key=repr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    snap=st.dictionaries(st.integers(1, 6), st.integers(0, 99),
                         min_size=0, max_size=6),
    stream=st.lists(
        st.tuples(
            st.integers(1, 8),          # key (may be outside snapshot)
            st.integers(0, 20),         # ts
            st.integers(0, 99),         # value
            st.booleans(),              # is_delete
        ),
        min_size=0, max_size=40,
    ),
)
def test_cdc_apply_matches_python_replay(spark, snap, stream):
    from impc_etl_spark.operators.history import cdc_apply

    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)],
        "k int, v int",
    )
    if not snap:
        snap_df = snap_df.where(F.lit(False))
    rows = [(k, v, t, i, "D" if d else "U")
            for i, (k, t, v, d) in enumerate(stream)]
    ch_df = spark.createDataFrame(
        rows or [(None, None, None, None, None)],
        "k int, v int, ts int, seq int, op string",
    )
    if not rows:
        ch_df = ch_df.where(F.lit(False))
    got = {r["k"]: r["v"] for r in cdc_apply(
        snap_df, ch_df, ["k"], "ts", tiebreak_cols=["seq"]
    ).collect()}

    latest: dict[int, tuple] = {}
    for k, v, t, i, op in rows:
        if k not in latest or (t, i) > latest[k][:2]:
            latest[k] = (t, i, v, op)
    want = dict(snap)
    for k, (_t, _i, v, op) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 5), st.integers(1, 8)),  # (group, item)
        min_size=1, max_size=40,
    ),
    cap=st.one_of(st.none(), st.integers(1, 4)),
)
def test_co_occurrence_matches_python_replay(spark, rows, cap):
    from impc_etl_spark.operators.aggregate import co_occurrence_pairs

    df = spark.createDataFrame(rows, "g int, item int")
    got = {
        (r["item_a"], r["item_b"]): r["n_groups"]
        for r in co_occurrence_pairs(df, "g", "item", max_basket=cap).collect()
    }

    baskets: dict[int, set] = {}
    for g, it in rows:
        baskets.setdefault(g, set()).add(it)
    want: dict[tuple, int] = {}
    for items in baskets.values():
        s = sorted(items)[: cap if cap is not None else len(items)]
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                want[(s[i], s[j])] = want.get((s[i], s[j]), 0) + 1
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    old_rows=st.dictionaries(st.integers(0, 30), st.sampled_from("abc"), max_size=20),
    new_rows=st.dictionaries(st.integers(0, 30), st.sampled_from("abc"), max_size=20),
)
def test_snapshot_diff_matches_set_logic(spark, old_rows, new_rows):
    from impc_etl_spark.operators.history import snapshot_diff

    def frame(d):
        rows = [(k, v) for k, v in d.items()] or [(None, None)]
        return spark.createDataFrame(rows, "doc_id long, fp string").where(
            F.col("doc_id").isNotNull()
        )

    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(frame(old_rows), frame(new_rows),
                                  ["doc_id"], "fp").collect()}
    want = {}
    for k in set(old_rows) | set(new_rows):
        if k not in old_rows:
            want[k] = "NEW"
        elif k not in new_rows:
            want[k] = "REMOVED"
        elif old_rows[k] == new_rows[k]:
            want[k] = "UNCHANGED"
        else:
            want[k] = "CHANGED"
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(0, 300), min_size=1, max_size=25),
    batch=st.integers(1, 7),
)
def test_length_buckets_matches_python_replay(spark, counts, batch):
    from impc_etl_spark.operators.text import length_buckets

    rows = [(i, "w " * n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"], r["batch_id"])
           for r in length_buckets(df, "text", batch_size=batch).collect()}

    import math
    want = {}
    per_bucket: dict[int, list] = {}
    for i, n in enumerate(counts):
        b = 2 ** math.ceil(math.log2(max(n, 1)))
        per_bucket.setdefault(b, []).append((n, i))
    for b, members in per_bucket.items():
        for rank, (n, i) in enumerate(sorted(members)):
            want[i] = (n, b, rank // batch)
    assert got == want


# --- BPE merge learning: random corpora vs pure-Python reference ------------

def _py_bpe(word_freqs: dict[str, int], num_merges: int):
    """Reference word-type BPE (Sennrich §3.2): symbol tuples, greedy
    left-to-right pair fusion, (count desc, left, right) argmax."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        merges.append((a, b, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1,
        max_size=12,
    ),
    reps=st.lists(st.integers(min_value=1, max_value=5), min_size=12,
                  max_size=12),
)
def test_learn_bpe_merges_matches_python_reference(spark, words, reps):
    from impc_etl_spark.operators.text import learn_bpe_merges

    docs = spark.createDataFrame(
        [(i, " ".join([w] * r)) for i, (w, r) in enumerate(zip(words, reps))],
        "doc_id long, text string",
    )
    got = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in learn_bpe_merges(docs, "text", num_merges=4,
                                  vocab_limit=100).collect()
    ]
    freqs: dict[str, int] = {}
    for w, r in zip(words, reps):
        freqs[w] = freqs.get(w, 0) + r
    want = _py_bpe(freqs, 4)
    assert got == want


# --- triangle counting: random graphs vs brute force ------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=0, max_value=9)),
        min_size=1, max_size=30,
    ),
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from impc_etl_spark.operators.graph import triangle_count

    undirected = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not undirected:
        return
    nodes = sorted({n for e in undirected for n in e})
    want: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= undirected:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1

    df = spark.createDataFrame(list(undirected), "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == want


# --- count-min sketch: random multisets vs Python reference ----------------

@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    items=st.lists(st.integers(min_value=0, max_value=20), min_size=1,
                   max_size=60),
)
def test_cms_matches_python_reference(spark, items):
    """Exact counter-grid parity with a Python CMS using the same md5 row
    hashes, and the estimate == min-of-rows for every item."""
    import hashlib

    from impc_etl_spark.operators.aggregate import cms_estimate, count_min_sketch

    depth, width = 3, 32

    def bucket(j: int, item: int) -> int:
        h = hashlib.md5(f"cms:{j}|{item}".encode()).hexdigest()
        return int(h[:15], 16) % width

    grid: dict[tuple[int, int], int] = {}
    for it in items:
        for j in range(depth):
            key = (j, bucket(j, it))
            grid[key] = grid.get(key, 0) + 1

    df = spark.createDataFrame([(i,) for i in items], "k long")
    sk = count_min_sketch(df, "k", depth=depth, width=width)
    got_grid = {(r["r"], r["c"]): r["n"] for r in sk.collect()}
    assert got_grid == grid

    est = {r["k"]: r["est_count"]
           for r in cms_estimate(sk, df.distinct(), "k", depth=depth,
                                 width=width).collect()}
    for it in set(items):
        assert est[it] == min(grid[(j, bucket(j, it))] for j in range(depth))


# --- streaming late-data contracts under shuffled micro-batch arrival -------
#
# Round-4 verdict item 5: the ewma_stream drop-late rule and the
# asof_join_stream watermark eviction were only example-tested; these
# hypothesis generators shuffle events across micro-batch arrival orders
# and assert the documented contracts against the batch twins — the test
# shape that would have caught both r4 streaming ADVICE findings.

_EVENT_SCHEMA = ("event_id bigint, ts bigint, user_id bigint, "
                 "event_type string, value double, props string")


def _stream_feed(spark, rows, n_batches):
    """Write `rows` (already in arrival order) as `n_batches` parquet
    files with staggered mtimes so maxFilesPerTrigger=1 delivers them as
    separate micro-batches in exactly this order. Returns (flat_dir,
    batches) where batches is the list of row-chunks."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    import pyspark.sql.functions as F2

    root = tempfile.mkdtemp(prefix="stream_prop_")
    per = max(1, -(-len(rows) // n_batches))  # ceil split, contiguous
    batches = [rows[i : i + per] for i in range(0, len(rows), per)]
    src = os.path.join(root, "src")
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, _EVENT_SCHEMA).withColumn(
            "ts", F2.col("ts") * F2.lit(1_000_000_000)  # sec → ns
        ).coalesce(1).write.parquet(f"{src}/f{i:03d}")
    flat = os.path.join(root, "flat")
    os.makedirs(flat)
    base = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))
    return flat, batches


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_ewma_stream_shuffled_arrival_matches_batch_twin(spark, data):
    """For ANY partition of events into micro-batches in ANY arrival
    order: events the drop-late contract admits get EXACTLY the batch
    twin's ewma over the admitted subsequence (bit-for-bit), and dropped
    or NULL-valued events get NULL — one output row per event either way."""
    import uuid

    from impc_etl_spark.operators.timeseries import ewma
    from impc_etl_spark.streaming.jobs import (
        ewma_stream, read_event_stream, run_available_now,
    )

    n = data.draw(st.integers(4, 10), label="n_events")
    events = []
    for i in range(n):
        events.append((
            i + 1,
            data.draw(st.integers(0, 3600), label=f"ts{i}"),
            data.draw(st.sampled_from([7, 8]), label=f"uid{i}"),
            data.draw(st.one_of(st.none(), st.integers(-50, 50)),
                      label=f"val{i}"),
        ))
    order = data.draw(st.permutations(events), label="arrival")
    n_batches = data.draw(st.integers(1, min(4, n)), label="n_batches")
    rows = [(eid, ts, uid, "m", None if v is None else float(v), "{}")
            for (eid, ts, uid, v) in order]
    flat, batches = _stream_feed(spark, rows, n_batches)

    # ---- model of the documented contract (which events are ADMITTED):
    # per key, batches in arrival order, (ts, id)-sorted within a batch;
    # an event at or before the last processed (ts, id) is dropped; NULL
    # values advance the cursor but emit NULL
    admitted = {k: [] for k in (7, 8)}           # kept (eid, ts, uid, v)
    cursor = {}                                   # uid -> (us, id)
    dropped = set()
    for chunk in batches:
        per_key = {}
        for (eid, ts, uid, _t, v, _p) in chunk:
            per_key.setdefault(uid, []).append((ts * 1_000_000, eid, v))
        for uid, evs in per_key.items():
            last_us, last_id = cursor.get(uid, (-(1 << 62), -(1 << 62)))
            for us, eid, v in sorted(evs):
                if us < last_us or (us == last_us and eid <= last_id):
                    dropped.add(eid)
                    continue
                last_us, last_id = us, eid
                if v is not None:
                    admitted[uid].append((eid, us, uid, v))
            cursor[uid] = (last_us, last_id)

    qname = f"ewma_prop_{uuid.uuid4().hex[:8]}"
    stream = ewma_stream(
        read_event_stream(spark, flat, max_files_per_trigger=1), alpha=0.3
    )
    run_available_now(stream, qname, flat + "_ckpt", output_mode="append")
    got = {r["event_id"]: r["ewma"] for r in spark.table(qname).collect()}
    assert len(got) == n                          # one output row per event

    # batch twin over the admitted events only — must agree bit-for-bit
    kept = [e for evs in admitted.values() for e in evs]
    want = {}
    if kept:
        twin = spark.createDataFrame(
            [(eid, us, uid, float(v)) for (eid, us, uid, v) in kept],
            "event_id bigint, us bigint, user_id bigint, value double",
        ).select("event_id", "user_id",
                 F.timestamp_micros("us").alias("ts"), "value")
        want = {r["event_id"]: r["ewma"]
                for r in ewma(twin, ["user_id"], "ts", "value", alpha=0.3,
                              tiebreak_cols=["event_id"]).collect()}
    for eid, ts, uid, v in [(e, t, u, v) for (e, t, u, v) in events]:
        if eid in dropped or v is None:
            assert got[eid] is None, (eid, got[eid])
        else:
            assert got[eid] == want[eid], (eid, got[eid], want[eid])


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_asof_stream_shuffled_arrival_and_eviction_contract(spark, data):
    """For ANY arrival order/batching of lefts+rights with timestamps wide
    enough to drive real watermark eviction: (1) every left emits exactly
    once; (2) a left whose batch-twin match is EVICTION-SAFE (right ts ≥
    global max ts − watermark, hence older than no admissible horizon)
    must match it exactly; (3) a left with NO arrived-in-time candidate
    must emit NULL; (4) any reported match must be a right of the same
    key that arrived no later than the left and sits in its window."""
    import uuid

    from impc_etl_spark.streaming.jobs import (
        asof_join_stream, read_event_stream, run_available_now,
    )

    WM_S, TOL_S = 3600, 1800                      # 1 h watermark, 30 min tol
    n_r = data.draw(st.integers(2, 6), label="n_rights")
    n_l = data.draw(st.integers(2, 6), label="n_lefts")
    rows = []
    for i in range(n_r):                          # distinct values: identity
        rows.append((100 + i, data.draw(st.integers(0, 14400),
                                        label=f"rts{i}"),
                     data.draw(st.sampled_from([7, 8]), label=f"rk{i}"),
                     "click", float(1000 + i), "{}"))
    for j in range(n_l):
        rows.append((500 + j, data.draw(st.integers(0, 14400),
                                        label=f"lts{j}"),
                     data.draw(st.sampled_from([7, 8]), label=f"lk{j}"),
                     "purchase", 1.0, "{}"))
    order = data.draw(st.permutations(rows), label="arrival")
    n_batches = data.draw(st.integers(1, 4), label="n_batches")
    flat, batches = _stream_feed(spark, order, n_batches)

    batch_of = {}
    for bi, chunk in enumerate(batches):
        for ev in chunk:
            batch_of[ev[0]] = bi
    max_ts = max(ev[1] for ev in order)
    rights = [ev for ev in order if ev[3] == "click"]
    lefts = [ev for ev in order if ev[3] == "purchase"]

    qname = f"asof_prop_{uuid.uuid4().hex[:8]}"
    es = read_event_stream(spark, flat, max_files_per_trigger=1)
    stream = asof_join_stream(
        es.where(F.col("event_type") == "purchase"),
        es.where(F.col("event_type") == "click"),
        key="user_id", tolerance="30 minutes", watermark="1 hour",
    )
    run_available_now(stream, qname, flat + "_ckpt", output_mode="append")
    out_rows = spark.table(qname).collect()
    out = {r["left_id"]: r for r in out_rows}
    # exactly once each — compare the full multiset so a double-emitted
    # left cannot hide behind the dict
    assert sorted(r["left_id"] for r in out_rows) == sorted(e[0] for e in lefts)

    for (lid, lts, lk, _t, _v, _p) in lefts:
        # rights of the same key that ARRIVED no later than the left
        arrived = [r for r in rights
                   if r[2] == lk and batch_of[r[0]] <= batch_of[lid]]
        in_window = [r for r in arrived if 0 <= lts - r[1] <= TOL_S]
        got_val = out[lid]["matched_value"]
        if not in_window:
            assert got_val is None, (lid, got_val)       # (3)
            continue
        best = max(in_window, key=lambda r: (r[1], r[4]))
        if best[1] >= max_ts - WM_S:                     # eviction-safe  (2)
            assert got_val == best[4], (lid, got_val, best)
        elif got_val is not None:                        # (4)
            assert got_val in {r[4] for r in in_window}, (lid, got_val)


# --- SCD2 build vs a Python reference model ---------------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_scd2_build_matches_python_model(spark, data):
    """Random change logs (duplicate timestamps, NULL attributes, NULL
    timestamps, single-row keys): scd2_build's version collapse, interval
    close, and is_current flag equal a direct Python walk of the
    (ts, id)-ordered log with null-safe attribute comparison."""
    from impc_etl_spark.operators.history import scd2_build

    n = data.draw(st.integers(1, 14), label="n")
    rows = []
    for i in range(n):
        rows.append((
            data.draw(st.sampled_from([1, 2]), label=f"k{i}"),
            data.draw(st.one_of(st.none(), st.integers(0, 5)), label=f"ts{i}"),
            data.draw(st.sampled_from(["x", "y", None]), label=f"a{i}"),
            i,
        ))
    df = spark.createDataFrame(rows, "k int, ts int, attr string, id int")
    got = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_build(df, ["k"], "ts", ["attr"], tiebreak_cols=["id"]).collect()
    }

    want = set()
    by_key: dict[int, list] = {}
    for k, ts, attr, i in rows:
        by_key.setdefault(k, []).append((ts, i, attr))
    for k, evs in by_key.items():
        # Spark asc ordering: NULL ts first, then ts, then id
        evs.sort(key=lambda e: (e[0] is not None, e[0] if e[0] is not None else 0, e[1]))
        versions = []               # (attr, valid_from)
        prev_attr = object()        # sentinel != any attr incl. None
        for ts, _i, attr in evs:
            if not versions or attr != prev_attr:
                versions.append((attr, ts))
            prev_attr = attr
        for vi, (attr, vfrom) in enumerate(versions):
            vto = versions[vi + 1][1] if vi + 1 < len(versions) else None
            want.add((k, attr, vfrom, vto, vi == len(versions) - 1))
    assert got == want, (sorted(rows, key=repr), got ^ want)


# --- PageRank vs a Python power-iteration model -----------------------------

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_pagerank_matches_python_power_iteration(spark, data):
    """Random digraphs (self-loops, parallel semantics via weight sum,
    dangling nodes): the distributed fixed-iteration PageRank equals a
    direct Python power iteration with uniform dangling redistribution,
    to float tolerance."""
    from impc_etl_spark.operators.graph import pagerank

    n_nodes = data.draw(st.integers(2, 7), label="n_nodes")
    n_edges = data.draw(st.integers(1, 12), label="n_edges")
    edges = sorted({
        (data.draw(st.integers(0, n_nodes - 1), label=f"s{i}"),
         data.draw(st.integers(0, n_nodes - 1), label=f"d{i}"))
        for i in range(n_edges)
    })
    iters = data.draw(st.integers(1, 4), label="iters")
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=iters, damping=0.85).collect()}

    nodes = sorted({u for e in edges for u in e})
    N = len(nodes)
    outdeg = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / N for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / outdeg[s]
        dm = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: (1 - 0.85) / N + 0.85 * (contrib[v] + dm / N) for v in nodes
        }
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-9), (v, got[v], rank[v])


# --- interval joins vs naive range predicates --------------------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_interval_point_join_matches_naive(spark, data):
    """The binned-grid interval/point join (bucket explode + first-bucket
    meeting) equals a naive O(n·m) range scan for every closed-mode,
    random bin width, and optional extra equi key — including intervals
    spanning many bins, zero-length intervals, and negative coordinates."""
    from impc_etl_spark.operators.joins import interval_point_join

    n_p = data.draw(st.integers(1, 12), label="n_points")
    n_i = data.draw(st.integers(1, 10), label="n_intervals")
    closed = data.draw(st.sampled_from(["both", "left", "right", "neither"]),
                       label="closed")
    bin_width = data.draw(st.sampled_from([1, 3, 7, 50]), label="bin_width")
    use_key = data.draw(st.booleans(), label="use_key")

    points = [(i, data.draw(st.integers(-30, 30), label=f"pt{i}"),
               data.draw(st.sampled_from([1, 2]), label=f"pk{i}"))
              for i in range(n_p)]
    intervals = []
    for j in range(n_i):
        a = data.draw(st.integers(-30, 30), label=f"ia{j}")
        b = data.draw(st.integers(0, 15), label=f"ib{j}")
        intervals.append((100 + j, a, a + b,
                          data.draw(st.sampled_from([1, 2]), label=f"ik{j}")))

    pdf = spark.createDataFrame(points, "pid int, t long, k int")
    idf = spark.createDataFrame(intervals, "iid int, s long, e long, k int")
    got = {
        (r["pid"], r["iid"])
        for r in interval_point_join(
            pdf, idf, "t", "s", "e", on=["k"] if use_key else (),
            bin_width=bin_width, closed=closed,
        ).collect()
    }

    def pred(t, s, e):
        lo = s <= t if closed in ("both", "left") else s < t
        hi = t <= e if closed in ("both", "right") else t < e
        return lo and hi

    want = {
        (pid, iid)
        for pid, t, pk in points
        for iid, s, e, ik in intervals
        if pred(t, s, e) and (pk == ik or not use_key)
    }
    assert got == want, (closed, bin_width, use_key, got ^ want)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_interval_overlap_join_matches_naive(spark, data):
    """The first-common-bucket overlap join equals the naive closed-
    interval overlap scan — every overlapping pair appears EXACTLY once
    (the dedup-free guarantee), none twice, none missed."""
    from impc_etl_spark.operators.joins import interval_overlap_join

    n_l = data.draw(st.integers(1, 8), label="n_l")
    n_r = data.draw(st.integers(1, 8), label="n_r")
    bin_width = data.draw(st.sampled_from([1, 4, 25]), label="bin_width")

    def ivs(n, base, tag):
        out = []
        for j in range(n):
            a = data.draw(st.integers(-20, 20), label=f"{tag}a{j}")
            b = data.draw(st.integers(0, 12), label=f"{tag}b{j}")
            out.append((base + j, a, a + b))
        return out

    lrows, rrows = ivs(n_l, 0, "l"), ivs(n_r, 100, "r")
    ldf = spark.createDataFrame(lrows, "lid int, ls long, le long")
    rdf = spark.createDataFrame(rrows, "rid int, rs long, re long")
    rows = interval_overlap_join(
        ldf, rdf, "ls", "le", "rs", "re", bin_width=bin_width
    ).collect()
    got = [(r["lid"], r["rid"]) for r in rows]
    want = {
        (lid, rid)
        for lid, ls, le in lrows
        for rid, rs, re in rrows
        if ls <= re and rs <= le
    }
    assert len(got) == len(set(got)), "pair emitted twice"   # exactly-once
    assert set(got) == want, (bin_width, set(got) ^ want)


# --- CDC apply vs a Python reference model ----------------------------------

@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_cdc_apply_matches_python_model(spark, data):
    """Random snapshots + change streams (duplicate change timestamps,
    NULL ops, deletes of absent keys, re-inserts after delete): cdc_apply
    equals a Python walk that keeps the latest (ts, id) change per key —
    delete removes, anything else (NULL op included) upserts."""
    from impc_etl_spark.operators.history import cdc_apply

    snap_keys = data.draw(st.lists(st.integers(0, 5), unique=True,
                                   min_size=0, max_size=5), label="snap")
    snapshot_rows = [(k, f"s{k}") for k in snap_keys]
    n_ch = data.draw(st.integers(0, 12), label="n_changes")
    changes = []
    for i in range(n_ch):
        changes.append((
            data.draw(st.integers(0, 5), label=f"ck{i}"),
            f"c{i}",
            data.draw(st.integers(0, 4), label=f"cts{i}"),
            data.draw(st.sampled_from(["U", "D", None]), label=f"cop{i}"),
            i,
        ))
    snapshot = spark.createDataFrame(snapshot_rows, "k int, v string") \
        if snapshot_rows else spark.createDataFrame([], "k int, v string")
    chg = spark.createDataFrame(changes, "k int, v string, ts int, op string, id int") \
        if changes else spark.createDataFrame([], "k int, v string, ts int, op string, id int")
    got = {(r["k"], r["v"])
           for r in cdc_apply(snapshot, chg, ["k"], "ts",
                              tiebreak_cols=["id"]).collect()}

    state = {k: v for k, v in snapshot_rows}
    latest: dict[int, tuple] = {}
    for k, v, ts, op, i in changes:
        if k not in latest or (ts, i) > (latest[k][0], latest[k][1]):
            latest[k] = (ts, i, v, op)
    for k, (_ts, _i, v, op) in latest.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == {(k, v) for k, v in state.items()}


# --- decoder fuzz: the never-raise contract ---------------------------------

@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_byte_decoders_never_raise_on_hostile_input(data):
    """Every codec-free byte parser must return a value or None — never
    raise — on arbitrary bytes AND on truncations/mutations of VALID
    payloads (the nastier case: plausible prefixes with corrupt
    interiors). One hostile payload must never kill a 100 TB scan task."""
    from impc_etl_spark.multimodal.media import (
        _gif_gray, _mp4_min, _png_gray, _wav_ima_adpcm, _wav_pcm16,
        _avi_container, _flac_streaminfo, decode_gif, decode_ima_wav,
        decode_jpeg, decode_png, decode_wav, demux_avi_frames,
        encode_jpeg_gray, flac_decode, flac_encode_mono16,
        probe_flac_header, probe_image_header, probe_tiff_header,
        probe_mp3_header, probe_mp4_header, probe_ogg_header,
        probe_wav_header,
        _aiff_pcm16, _bmp_gray, _mp3_frame, _adts_frame, _pgm_gray,
        _tiff_gray, decode_aiff, decode_bmp, decode_pnm, decode_tiff,
        decode_ico, decode_tga, decode_webp,
        encode_jpeg_gray_progressive, encode_webp_gray, probe_svg_header,
        _tga_gray, walk_adts_frames, walk_gif_frames, walk_mp3_frames,
    )

    valid = [
        _png_gray(bytes(range(16)), 4, 4),
        _gif_gray(bytes(range(16)), 4, 4),
        _wav_pcm16([1, -1, 32767, -32768], 8000),
        _wav_ima_adpcm([0, 500, -500, 30000, -30000], 8000),
        _mp4_min(600, 12345, 2),
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 40,
        b"GIF89a" + b"\x00" * 40,
        b"RIFF\xff\xff\xff\xffWAVE" + b"\x00" * 40,
        b"\xff\xd8\xff\xe0" + b"\x00" * 40,
        b"ID3\x04\x00\x00\x00\x00\x00\x14" + b"\x00" * 30,
        _flac_streaminfo(44100, 2, 16, 999),
        _avi_container([b"frame1", b"frame22"]),
        encode_jpeg_gray(bytes(range(64)), 8, 8),
        flac_encode_mono16([1, -2, 300, -400, 5], 8000),
        b"OggS" + b"\x00" * 30,
        b"II*\x00\x08\x00\x00\x00" + b"\x00" * 30,
        _bmp_gray(bytes(range(15)), 5, 3),
        _tiff_gray(bytes(range(18)), 6, 3, rows_per_strip=2, packbits=True),
        _pgm_gray(bytes(range(20)), 4, 5),
        _aiff_pcm16([1, -1, 32767, -32768], 8000),
        encode_jpeg_gray_progressive(bytes(range(64)), 8, 8),
        encode_webp_gray(bytes(range(21)), 7, 3),
        _mp3_frame(9, 1) + _mp3_frame(1, 0),
        _adts_frame(4, 2, 40),
        b"\x00\x00\x01\x00\x01\x00\x04\x04\x00\x00\x01\x00\x20\x00"
        + b"\x10\x00\x00\x00\x16\x00\x00\x00" + b"\x00" * 16,
        _tga_gray(bytes(range(24)), 6, 4, rle=True),
        b'<?xml version="1.0"?><svg width="9" height="9"/>',
    ]
    base = data.draw(st.one_of(
        st.binary(min_size=0, max_size=200),
        st.sampled_from(valid),
    ), label="base")
    # mutate: truncate and/or flip a byte
    if base and data.draw(st.booleans(), label="truncate"):
        base = base[: data.draw(st.integers(0, len(base)), label="cut")]
    if base and data.draw(st.booleans(), label="mutate"):
        i = data.draw(st.integers(0, len(base) - 1), label="pos")
        b = data.draw(st.integers(0, 255), label="val")
        base = base[:i] + bytes([b]) + base[i + 1 :]

    for fn in (decode_png, decode_gif, decode_wav, decode_ima_wav,
               probe_image_header, probe_wav_header, probe_mp3_header,
               probe_mp4_header, probe_flac_header, probe_ogg_header,
               demux_avi_frames, decode_jpeg, flac_decode,
               probe_tiff_header, decode_bmp, decode_tiff, decode_pnm,
               decode_aiff, decode_webp, decode_ico, decode_tga,
               probe_svg_header, walk_mp3_frames, walk_adts_frames,
               walk_gif_frames):
        fn(base)            # must not raise; return value unconstrained


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_gif_lzw_roundtrip(data):
    """The from-spec GIF LZW pair must invert exactly for every index
    stream — including runs long enough to force code-width growth and
    the 4096-entry table reset — at every legal minimum code size."""
    from impc_etl_spark.multimodal.media import _gif_lzw_decode, _gif_lzw_encode

    mcs = data.draw(st.integers(2, 8), label="min_code_size")
    # mix arbitrary streams with highly repetitive ones (dictionary
    # growth is fastest on repeats — that's where width/reset bugs live)
    kind = data.draw(st.integers(0, 2), label="kind")
    if kind == 0:
        idx = data.draw(
            st.binary(min_size=0, max_size=3000).map(
                lambda b: bytes(v % (1 << mcs) for v in b)
            ),
            label="indices",
        )
    elif kind == 1:
        unit = data.draw(st.binary(min_size=1, max_size=4), label="unit")
        reps = data.draw(st.integers(1, 8000), label="reps")
        idx = bytes(v % (1 << mcs) for v in unit * reps)[:16000]
    else:
        n = data.draw(st.integers(0, 16000), label="n")
        idx = bytes(i % (1 << mcs) for i in range(n))
    enc = _gif_lzw_encode(idx, mcs)
    dec = _gif_lzw_decode(enc, mcs)
    assert dec is not None and bytes(dec) == idx


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_png_and_gif_codecs_agree_on_random_pixels(data):
    """Encode the SAME random grayscale pixels through both real codecs
    (PNG: struct+zlib; GIF: from-spec LZW) and decode both — identical
    (w, h, mode, samples) out. Two independent codec stacks cannot share
    a bug and both pass; catches container/filter/palette/LZW slips the
    single-codec roundtrips could miss."""
    from impc_etl_spark.multimodal.media import (
        _gif_gray, _png_gray, decode_gif, decode_png,
    )

    w = data.draw(st.integers(1, 12), label="w")
    h = data.draw(st.integers(1, 12), label="h")
    pixels = bytes(
        data.draw(st.integers(0, 255), label=f"px{i}") for i in range(w * h)
    )
    png = decode_png(_png_gray(pixels, w, h))
    gif = decode_gif(_gif_gray(pixels, w, h))
    assert png is not None and gif is not None
    assert png == gif == (w, h, "L", bytearray(pixels))


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_jpeg_roundtrip_error_bounded(data):
    """Random grayscale images survive the real encode→decode roundtrip
    with quantization-bounded error: smooth images (low-frequency) come
    back within a few levels; arbitrary noise decodes without error
    explosion (mean error well under the worst quantization step)."""
    from impc_etl_spark.multimodal.media import decode_jpeg, encode_jpeg_gray

    w = data.draw(st.integers(1, 24), label="w")
    h = data.draw(st.integers(1, 24), label="h")
    smooth = data.draw(st.booleans(), label="smooth")
    if smooth:
        a = data.draw(st.integers(0, 255), label="a")
        gx = data.draw(st.integers(-3, 3), label="gx")
        gy = data.draw(st.integers(-3, 3), label="gy")
        px = bytes(max(0, min(255, a + gx * x + gy * y))
                   for y in range(h) for x in range(w))
    else:
        px = bytes(data.draw(st.integers(0, 255), label=f"p{i}")
                   for i in range(w * h))
    got = decode_jpeg(encode_jpeg_gray(px, w, h))
    assert got is not None and got[:3] == (w, h, "L")
    errs = [abs(a - b) for a, b in zip(px, got[3])]
    if smooth:
        assert max(errs) <= 16
    else:
        assert sum(errs) / len(errs) <= 40


@settings(max_examples=80, deadline=None)
@given(samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=600))
def test_flac_roundtrip_lossless(samples):
    """FLAC is lossless: ANY int16 stream survives the real
    fixed-predictor + Rice encode→decode roundtrip bit-exactly."""
    from impc_etl_spark.multimodal.media import flac_decode, flac_encode_mono16

    assert flac_decode(flac_encode_mono16(samples, 16000)) == (
        16000, 1, samples)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_warc_roundtrip_property(data):
    """Any record list — arbitrary binary payloads (separator bytes
    included), optional headers — survives build_warc → parse_warc_records
    exactly, plain and gzipped."""
    from impc_etl_spark.sources.readers import build_warc, parse_warc_records

    n = data.draw(st.integers(1, 6), label="n")
    recs = []
    for k in range(n):
        recs.append({
            "type": data.draw(st.sampled_from(
                ["response", "request", "metadata", "warcinfo"]),
                label=f"t{k}"),
            "record_id": f"<urn:test:{k}>",
            "target_uri": data.draw(st.one_of(
                st.none(), st.just(f"https://x/{k}")), label=f"u{k}"),
            "date": "2026-01-01T00:00:00Z",
            "payload": data.draw(st.binary(max_size=300), label=f"p{k}"),
        })
    gz = data.draw(st.booleans(), label="gz")
    got = parse_warc_records(build_warc(recs, compress=gz))
    assert got is not None and len(got) == len(recs)
    for want, have in zip(recs, got):
        assert have["type"] == want["type"]
        assert have["target_uri"] == want["target_uri"]
        assert have["payload"] == want["payload"]


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_webp_lossless_roundtrip_property(data):
    """VP8L is lossless: ANY random grayscale image survives the real
    encode→decode roundtrip bit-exactly (exercises simple codes, true
    Huffman + Kraft rebalancing, and the subtract-green transform)."""
    from impc_etl_spark.multimodal.media import decode_webp, encode_webp_gray

    w = data.draw(st.integers(1, 16), label="w")
    h = data.draw(st.integers(1, 10), label="h")
    skew = data.draw(st.booleans(), label="skew")
    if skew:
        # heavy-tailed histograms drive deep Huffman trees
        vals = data.draw(st.lists(st.integers(0, 255), min_size=1,
                                  max_size=4, unique=True), label="vals")
        px = bytes(
            data.draw(st.sampled_from(vals + [data.draw(
                st.integers(0, 255), label=f"r{i}")]), label=f"px{i}")
            for i in range(w * h)
        )
    else:
        px = bytes(data.draw(st.integers(0, 255), label=f"px{i}")
                   for i in range(w * h))
    assert decode_webp(encode_webp_gray(px, w, h)) == \
        (w, h, "L", bytearray(px))


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_progressive_equals_baseline_property(data):
    """Progressive and baseline JPEG encodings of the same image carry
    identical quantized coefficients and must decode bit-identically."""
    from impc_etl_spark.multimodal.media import (
        decode_jpeg, encode_jpeg_gray, encode_jpeg_gray_progressive,
    )

    w = data.draw(st.integers(1, 20), label="w")
    h = data.draw(st.integers(1, 20), label="h")
    px = bytes(data.draw(st.integers(0, 255), label=f"px{i}")
               for i in range(w * h))
    base = decode_jpeg(encode_jpeg_gray(px, w, h))
    prog = decode_jpeg(encode_jpeg_gray_progressive(px, w, h))
    assert prog is not None and prog == base


# --- r6 operators: Luhn, C4 filter, BFS ------------------------------------

def _py_luhn(s: str) -> bool:
    if not (s.isdigit() and 12 <= len(s) <= 19):
        return False
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="0123456789a", min_size=0, max_size=22),
                min_size=1, max_size=20))
def test_luhn_check_equals_python_reference(spark, strings):
    from impc_etl_spark.operators.text import luhn_check

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = {r["s"]: bool(r["v"]) for r in
           df.select("s", luhn_check("s").alias("v")).collect()}
    for s in strings:
        assert got[s] == _py_luhn(s), s


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet=" abc.{!", min_size=0, max_size=30),
                min_size=0, max_size=15),
       st.integers(min_value=1, max_value=6))
def test_c4_filter_subset_and_monotone_in_min_words(spark, lines, mw):
    """Kept lines are a sublist of the input, and raising min_words only
    ever drops MORE (nested filters — the same monotonicity contract the
    sampling family guarantees)."""
    from impc_etl_spark.operators.text import c4_line_filter

    df = spark.createDataFrame([(1, lines)], "id int, lines array<string>")
    loose = df.select(c4_line_filter("lines", min_words=mw).alias("k")).first()["k"]
    tight = df.select(c4_line_filter("lines", min_words=mw + 1).alias("k")).first()["k"]
    # subsequence-of-input check
    it = iter(lines)
    assert all(any(x == y for y in it) for x in loose)
    assert set(tight) <= set(loose)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=30),
       st.integers(min_value=0, max_value=12))
def test_bfs_distances_equal_python_bfs(spark, edges, source):
    from collections import deque

    from impc_etl_spark.operators.graph import bfs_distances

    und = edges + [(b, a) for a, b in edges]
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    want = {source: 0}
    dq = deque([source])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)

    e = spark.createDataFrame(und, ["src", "dst"])
    s = spark.createDataFrame([(source,)], ["node"])
    got = {r["node"]: r["dist"] for r in bfs_distances(e, s).collect()}
    assert got == want
