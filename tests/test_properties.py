"""Property-based tests (hypothesis) — fast driver-side properties plus a
bounded-example Spark property for the SCD2 merge invariants."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineeringpipeline_spark import ingest, rules

# -- WatermarkStore: any op sequence keeps file and memory in sync -----------

_ops = st.lists(
    st.tuples(
        st.sampled_from(["update", "delete"]),
        st.sampled_from(["t1", "t2"]),
        st.integers(min_value=0, max_value=10**15),
    ),
    max_size=30,
)


@given(_ops)
@settings(max_examples=50, deadline=None)
def test_watermark_store_file_always_matches_memory(tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("wm") / "wm.json")
    store = ingest.WatermarkStore(path)
    for op, table, value in ops:
        if op == "update":
            store.update(table, "ts", value, row_count=1)
        else:
            store.delete(table, "ts")
    reloaded = ingest.WatermarkStore(path)
    for table in ("t1", "t2"):
        assert reloaded.get(table, "ts").__dict__ == store.get(table, "ts").__dict__


# -- literal-typing rewrite: identifiers and structure survive ----------------

_ident = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@given(_ident, st.integers(0, 999), st.integers(1, 999))
@settings(max_examples=100, deadline=None)
def test_double_literal_rewrite_only_touches_float_literals(name, a, b):
    expr = f"{name} + {a} / ({name}_{b} * {a}.{b})"
    out = rules._double_literals(expr)
    # every float literal is wrapped, and unwrapping recovers the input
    assert out.replace("CAST(", "").replace(" AS DOUBLE)", "") == expr
    assert f"CAST({a}.{b} AS DOUBLE)" in out
    assert name in out and f"{name}_{b}" in out  # identifiers untouched


# -- SCD2 merge invariants over random snapshots (bounded Spark examples) ----

_snapshot = st.dictionaries(
    st.integers(min_value=1, max_value=6),  # keys
    st.sampled_from(["A", "B", "C", None]),  # tracked attribute
    min_size=1,
    max_size=6,
)


@given(_snapshot, _snapshot)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_scd2_invariants(spark, base, update):
    from dataengineeringpipeline_spark import cleaning

    current = cleaning.scd2_columns(
        spark.createDataFrame([(k, v) for k, v in base.items()], "id int, attr string"),
        "2024-01-01",
    )
    updates = spark.createDataFrame([(k, v) for k, v in update.items()], "id int, attr string")
    merged = cleaning.scd2_merge(current, updates, "id", ["attr"], "2024-06-01").collect()

    open_rows = [r for r in merged if r["is_current"]]
    closed = [r for r in merged if not r["is_current"]]
    # exactly one open version per key ever seen
    assert sorted(r["id"] for r in open_rows) == sorted(set(base) | set(update))
    # open version carries the latest value for updated keys, base value otherwise
    for r in open_rows:
        expected = update[r["id"]] if r["id"] in update else base[r["id"]]
        assert r["attr"] == expected
    # closed versions exist exactly for keys whose value changed
    changed = {k for k in set(base) & set(update) if base[k] != update[k]}
    assert sorted(r["id"] for r in closed) == sorted(changed)
    for r in closed:
        assert str(r["expiry_date"]) == "2024-06-01" and r["attr"] == base[r["id"]]


# -- chunking/packing invariants over arbitrary corpora ----------------------

_words = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
    min_size=0,
    max_size=60,
)


@given(st.lists(_words, min_size=1, max_size=6), st.integers(2, 12), st.integers(0, 4))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_covers_every_token_exactly(spark, docs_words, chunk_tokens, overlap):
    """For ANY corpus and any (chunk, overlap) config: concatenating each
    doc's chunks with the overlap removed reproduces the doc's token
    stream exactly — no token lost, none duplicated, order preserved."""
    from dataengineeringpipeline_spark.operators import text as text_ops

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.chunk_documents(docs, chunk_tokens, overlap).collect()
    stride = chunk_tokens - overlap
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(rows):
        toks = docs_words[i]
        chunks = by_doc.get(i, [])
        if not toks:
            assert chunks == []
            continue
        for r in chunks:
            ctoks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert len(ctoks) == r["chunk_token_count"] <= chunk_tokens
        # chunk j starts at offset j*stride; overlaying each chunk at its
        # offset must reproduce the token stream with no gap or mismatch
        rebuilt: list = []
        for r in chunks:
            ctoks = r["chunk_text"].split(" ")
            start = r["chunk_idx"] * stride
            assert start <= len(rebuilt)  # no coverage gap between chunks
            assert rebuilt[start:] == ctoks[: len(rebuilt) - start]  # overlap agrees
            rebuilt = rebuilt[:start] + ctoks
        assert rebuilt == toks


# -- count-min sketch: never undercounts, mass-preserving --------------------

_keys = st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=120)


@given(_keys)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_cms_estimate_dominates_truth_for_any_keys(spark, keys):
    """CM property: for EVERY key (negatives included — pmod bucketing),
    estimate >= exact count, and each sketch row carries the full input
    mass (the mergeability invariant)."""
    from collections import Counter

    from dataengineeringpipeline_spark import scale

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {r["k"]: (r["est_count"], r["true_count"]) for r in
           scale.cms_heavy_hitters(df, "k", top_n=len(keys)).collect()}
    truth = Counter(keys)
    assert set(got) == set(truth)
    for k, (est, true) in got.items():
        assert true == truth[k] and est >= true
    per_d = {r["d"]: r["s"] for r in
             scale.cms_sketch(df, "k").groupBy("d").sum("c").withColumnRenamed("sum(c)", "s").collect()}
    assert set(per_d.values()) == {len(keys)}


# -- error classifier / recovery policy: total and bounded --------------------


@given(st.text(max_size=80), st.sampled_from([RuntimeError, ValueError, OSError, ConnectionError, TimeoutError, KeyError]))
@settings(max_examples=100, deadline=None)
def test_classify_error_is_total(msg, exc_type):
    from dataengineeringpipeline_spark import orchestrator

    cls = orchestrator.classify_error(exc_type(msg))
    assert isinstance(cls, orchestrator.ErrorClass)


@given(st.integers(0, 10), st.integers(1, 5))
@settings(max_examples=50, deadline=None)
def test_recovery_never_retries_past_the_bound(attempts, bound):
    from dataengineeringpipeline_spark import orchestrator

    policy = orchestrator.RecoveryPolicy(max_recovery_attempts=bound)
    _, action = policy.decide(ConnectionError("down"), attempts)
    if attempts >= bound:
        assert action is not orchestrator.RecoveryAction.RETRY
    else:
        assert action is orchestrator.RecoveryAction.RETRY
    assert policy.delay_s(attempts) <= policy.max_delay_s


# -- HLL registers: python-model equality for any keys -----------------------

_hll_keys = st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=120)


@given(_hll_keys)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_hll_registers_match_python_model(spark, keys):
    """The register table equals a pure-python md5 model for ANY key set
    (bucket split, leading-zero rank, max-merge), and registers depend
    only on the distinct key set — duplicates never change them."""
    import hashlib

    from dataengineeringpipeline_spark import scale

    def model(ks):
        regs: dict[int, int] = {}
        for k in set(ks):
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
            bucket, w = divmod(h, 1 << scale.HLL_REGISTER_BITS)
            rho = (
                scale.HLL_REGISTER_BITS + 1
                if w == 0
                else scale.HLL_REGISTER_BITS - (w.bit_length() - 1)
            )
            regs[bucket] = max(regs.get(bucket, 0), rho)
        return regs

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r["bucket"]: r["max_rho"] for r in scale.hll_registers(df, "k").collect()
    }
    assert got == model(keys)
    doubled = spark.createDataFrame([(k,) for k in keys + keys], "k bigint")
    got2 = {
        r["bucket"]: r["max_rho"] for r in scale.hll_registers(doubled, "k").collect()
    }
    assert got2 == got


# -- duplicate-span coverage: structural invariants for any corpus -----------

_span_docs = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=120), min_size=1, max_size=8
)


@given(_span_docs)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_duplicate_span_coverage_invariants(spark, texts):
    """For ANY corpus: coverage never exceeds the document, dup windows
    never exceed total windows, a doc shorter than the window reports
    zero, and appending an exact copy of a long doc makes every one of
    the copy's windows duplicated (full window coverage)."""
    from dataengineeringpipeline_spark.operators.dedup import duplicate_span_coverage

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in duplicate_span_coverage(df).collect():
        assert 0 <= r["dup_chars"] <= r["doc_chars"]
        assert 0 <= r["dup_windows"] <= r["total_windows"]
        if r["doc_chars"] < 40:
            assert r["total_windows"] == 0 and r["dup_chars"] == 0
    long_texts = [t for t in texts if len(t) >= 40]
    if long_texts:
        rows2 = rows + [(len(rows), long_texts[0])]
        df2 = spark.createDataFrame(rows2, "doc_id long, text string")
        copy_row = [
            r for r in duplicate_span_coverage(df2).collect() if r["doc_id"] == len(rows)
        ][0]
        assert copy_row["dup_windows"] == copy_row["total_windows"] > 0


# -- Bloom filter: bitmap matches a python md5 model, never false-negative ---

_bloom_keys = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=80
)


@given(_bloom_keys, _bloom_keys)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bloom_matches_python_model_and_never_drops_members(spark, keys, probes):
    """For ANY key set: the packed bitmap equals a pure-python md5 model
    bit for bit, every member key passes the probe, and every passing
    probe is predicted by the model (false positives included)."""
    import hashlib

    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import scale

    m, k = 512, 3

    def positions(key):
        return [
            int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:12], 16) % m
            for j in range(k)
        ]

    bits = sorted({p for key in set(keys) for p in positions(key)})
    kdf = spark.createDataFrame([(x,) for x in keys], "key bigint")
    bloom = scale.bloom_build(kdf, "key", m=m, k=k)
    row = bloom.collect()[0]
    assert row["bits_set"] == len(bits)
    model_words: dict[int, int] = {}
    for p in bits:
        model_words[p // 64] = model_words.get(p // 64, 0) | (1 << (p % 64))
    # compare as unsigned: Spark longs are signed 64-bit
    got_words = {wi: w & (2**64 - 1) for wi, w in row["bloom_words"].items()}
    assert got_words == model_words
    pdf = spark.createDataFrame([(x,) for x in set(keys) | set(probes)], "key bigint")
    passed = {
        r["key"] for r in scale.bloom_prune(pdf, bloom, "key", m=m, k=k).collect()
    }
    bitset = set(bits)
    predicted = {
        x for x in set(keys) | set(probes) if all(p in bitset for p in positions(x))
    }
    assert set(keys) <= passed  # no false negatives, ever
    assert passed == predicted  # fp behavior exactly as the model says


# -- category drift: TV distance matches a python fraction model -------------

_drift_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.booleans()),
    min_size=2,
    max_size=60,
).filter(lambda rows: any(b for _, b in rows) and any(not b for _, b in rows))


@given(_drift_rows)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_category_drift_matches_python_model(spark, rows):
    """For ANY two-period categorical sample: tv ∈ [0,1], equals the
    exact python fraction computation bit for bit, and is 0 iff the two
    mixes are identical."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import quality

    data = [
        (cat, "2024-01-01" if is_base else "2024-03-01") for cat, is_base in rows
    ]
    df = spark.createDataFrame(data, "cat string, d string").select(
        "cat", F.to_timestamp("d").alias("ts")
    )
    out = quality.category_drift(df, "cat", "ts", "2024-02-01").collect()
    base = [c for c, b in rows if b]
    cur = [c for c, b in rows if not b]
    nb, nc = len(base), len(cur)
    cats = sorted(set(base) | set(cur))
    numer = sum(abs(base.count(c) * nc - cur.count(c) * nb) for c in cats)
    tv_exact = Fraction(numer, 2 * nb * nc)
    tv_float = float(numer) / (2.0 * float(nb) * float(nc))
    assert all(r["tv_distance"] == tv_float for r in out)
    assert 0.0 <= tv_float <= 1.0
    same_mix = all(
        Fraction(base.count(c), nb) == Fraction(cur.count(c), nc) for c in cats
    )
    assert (tv_exact == 0) == same_mix
    if same_mix:
        assert all(r["tv_distance"] == 0.0 for r in out)


# -- BPE: the distributed trainer matches a pure-python model ----------------

_bpe_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=25
)


@given(_bpe_words)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bpe_train_matches_python_model(spark, words):
    """For ANY corpus: the learned merge table equals a pure-python
    implementation of the same semantics (greedy-left delimited replace,
    count-desc pair-asc argmax) round for round."""
    from collections import Counter

    from dataengineeringpipeline_spark.operators import bpe

    def model(ws, n):
        vocab = Counter()
        for w in ws:
            vocab[" ".join(w)] += 1
        merges = []
        for rank in range(n):
            pc: Counter = Counter()
            for sym, freq in vocab.items():
                parts = sym.split(" ")
                for i in range(len(parts) - 1):
                    pc[f"{parts[i]} {parts[i + 1]}"] += freq
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            pair, cnt = best
            merged = pair.replace(" ", "")
            merges.append((rank, pair, merged, cnt))
            nv = Counter()
            for sym, freq in vocab.items():
                ns = f" {sym} ".replace(f" {pair} ", f" {merged} ").strip()
                nv[ns] += freq
            vocab = nv
        return merges

    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = [
        (m["merge_rank"], m["pair"], m["merged"], m["pair_count"])
        for m in bpe.bpe_train(docs, n_merges=4)
    ]
    assert got == model(words, 4)


# -- CDC apply matches a python fold over any changelog ----------------------

_cdc_snap = st.dictionaries(
    st.integers(0, 9), st.integers(0, 99), min_size=0, max_size=6
)
_cdc_changes = st.lists(
    st.tuples(
        st.integers(0, 9),                     # key
        st.sampled_from(["U", "D"]),           # op
        st.integers(0, 99),                    # value
        st.integers(0, 5),                     # ts
        st.integers(0, 3),                     # tiebreak
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: (t[0], t[3], t[4]),    # (key, ts, tb) total order
)


@given(_cdc_snap, _cdc_changes)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_cdc_apply_matches_python_model_and_is_idempotent(spark, snap, changes):
    """For ANY snapshot and changelog with a per-key total order:
    cdc_apply == 'replay the log in order, keep last state, drop
    tombstones', and re-applying the same batch is a no-op."""
    from dataengineeringpipeline_spark.scd import cdc_apply

    snap_df = spark.createDataFrame(
        [(k, v, -1, -1) for k, v in snap.items()], "k int, v int, ts int, tb int"
    )
    chg_df = spark.createDataFrame(
        changes, "k int, op string, v int, ts int, tb int"
    )
    got = {
        r["k"]: (r["v"], r["ts"], r["tb"])
        for r in cdc_apply(
            snap_df, chg_df, ["k"], "ts", op_col="op", tiebreak_cols=["tb"]
        ).collect()
    }

    want = {k: (v, -1, -1) for k, v in snap.items()}
    for k, op, v, ts, tb in sorted(changes, key=lambda t: (t[3], t[4])):
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = (v, ts, tb)
    assert got == want

    again = {
        r["k"]: (r["v"], r["ts"], r["tb"])
        for r in cdc_apply(
            cdc_apply(
                snap_df, chg_df, ["k"], "ts", op_col="op", tiebreak_cols=["tb"]
            ),
            chg_df,
            ["k"],
            "ts",
            op_col="op",
            tiebreak_cols=["tb"],
        ).collect()
    }
    assert again == got


# -- IVM: any split of the fact merges back to the full recompute ------------

_ivm_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                       # date bucket
        st.integers(0, 4),                       # customer
        st.integers(1, 10_000),                  # price cents
    ),
    min_size=1,
    max_size=25,
)


@given(_ivm_rows, st.integers(0, 4))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_ivm_merge_equals_full_recompute_for_any_split(spark, rows, cut):
    """For ANY fact rows and ANY base/delta split point: partials(base)
    ⊕ partials(delta) folded to the summary is BIT-identical to the
    batch summary over the union — the IVM contract, including the
    stddev's exact decimal sums."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import gold, ivm

    def mk(rs):
        return spark.createDataFrame(
            [
                (f"2024-01-{d + 1:02d}", c, cents / 100.0, True)
                for d, c, cents in rs
            ],
            "order_date string, customer_key int, total_price double, is_complete_order boolean",
        ).withColumn("order_date", F.col("order_date").cast("date"))

    base = [r for r in rows if r[1] < cut]
    delta = [r for r in rows if r[1] >= cut]
    merged = ivm.merge_partials(
        ivm.sales_partials(mk(base)) if base else ivm.sales_partials(mk(rows)).limit(0),
        ivm.sales_partials(mk(delta)) if delta else ivm.sales_partials(mk(rows)).limit(0),
    )
    inc = ivm.daily_summary_from_partials(merged).collect()
    full = gold.daily_sales_summary(mk(rows)).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]


# -- lakehouse SCD2 merge == logical apply for ANY batch ----------------------

_changelog = st.lists(
    st.tuples(
        st.integers(1, 4),  # key
        st.sampled_from(["A", "B", "C"]),  # tracked attr
        st.integers(0, 9),  # ts
        st.integers(0, 99),  # tiebreak
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: (t[0], t[2], t[3]),
)


@given(_changelog, _changelog)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_scd2_equals_logical_apply_for_any_batch(
    spark, tmp_path_factory, batch1, batch2
):
    """The physical file-pruned SCD2 MERGE must equal the frame-level
    scd2_apply_changes for ANY pair of change batches — dup suppression,
    late splices, new keys, and no-op updates included."""
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.scd import scd2_apply_changes, scd2_history

    ddl = "k int, attr string, ts int, tb int"
    b1 = spark.createDataFrame(batch1, ddl)
    b2 = spark.createDataFrame(batch2, ddl)
    hist = scd2_history(b1, ["k"], ["attr"], "ts", tiebreak_cols=["tb"], carry_cols=["tb"])
    lake = Lake(str(tmp_path_factory.mktemp("scd2prop")))
    lake.write(hist, "gold", "h")
    lake.merge_scd2(
        spark, "gold", "h", b2,
        key_col="k", attr_cols=("attr",), ts_col="ts",
        tiebreak_cols=("tb",), carry_cols=("tb",),
    )
    got = sorted(map(tuple, lake.read(spark, "gold", "h").collect()))
    want = sorted(
        map(
            tuple,
            scd2_apply_changes(
                hist, b2, ["k"], ["attr"], "ts",
                tiebreak_cols=["tb"], carry_cols=["tb"],
            ).collect(),
        )
    )
    assert got == want


# -- JPEG: flat fixed points exact for any even value / dims ------------------


@given(
    st.integers(0, 127),
    st.integers(1, 20),
    st.integers(1, 20),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_flat_even_value_exact_for_any_dims(half_v, h, w):
    import numpy as np

    from dataengineeringpipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    v = 2 * half_v
    img = np.full((h, w), v, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img))
    assert got.shape == (h, w, 3) and np.all(got == v)


@given(st.integers(0, 2**32 - 1), st.integers(8, 24), st.integers(8, 24))
@settings(max_examples=10, deadline=None)
def test_jpeg_random_image_roundtrip_is_bounded_and_deterministic(seed, h, w):
    """Arbitrary uint8 noise: dims always preserved, encode is
    byte-deterministic, and Q50 quantization error stays bounded in the
    mean (worst-case pixels can ring, the mean cannot)."""
    import numpy as np

    from dataengineeringpipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = encode_jpeg(img)
    assert payload == encode_jpeg(img)
    got = decode_jpeg(payload)
    assert got.shape == (h, w, 3)
    err = np.abs(got[..., 0].astype(int) - img.astype(int))
    assert err.mean() < 40.0


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["cdc-", "goldrefresh-", "feed:", "b"]),
            st.integers(min_value=0, max_value=500),
        ),
        max_size=120,
    )
)
@settings(max_examples=200, deadline=None)
def test_ledger_applied_ids_always_read_applied(ops):
    """v2 applied-batch ledger model check: EVERY id ever added reads
    as applied afterwards (the exactly-once guarantee can never drop a
    recorded batch, regardless of interleaving, duplicates, or window
    compaction), the serialized form stays bounded, and an id AHEAD of
    its stream's frontier never reads applied (a future batch can't be
    spuriously skipped)."""
    import json as _json

    from dataengineeringpipeline_spark.datalake import _LEDGER_WINDOW, _Ledger

    led = _Ledger()
    added = set()
    frontier: dict[str, int] = {}
    for prefix, seq in ops:
        led.add(f"{prefix}{seq}")
        added.add(f"{prefix}{seq}")
        frontier[prefix] = max(frontier.get(prefix, -1), seq)
        # round-trip through JSON at every step: what rides the swap is
        # the serialized form
        led = _Ledger.from_json(_json.loads(_json.dumps(led.to_json())))
    for bid in added:
        assert bid in led
    for prefix, top in frontier.items():
        assert f"{prefix}{top + 1}" not in led  # frontier+1 never applied
    for st_state in led.to_json()["streams"].values():
        assert len(st_state["recent"]) <= _LEDGER_WINDOW
