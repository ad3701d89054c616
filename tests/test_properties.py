"""Property-based tests (SURVEY.md §5 item 4) — hypothesis generates the
inputs, a single shared SparkSession executes them.

Strategy notes: examples are kept small (Spark job per example is the
cost), deadline disabled, and text is drawn from a mixed alphabet
including unicode, punctuation, digits, and whitespace runs to hit the
tokenizer's artifact space (FIXTURES.md cross-cutting requirements).
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_dfs_mapreduce_spark.mapreduce import MapReduceJob
from go_dfs_mapreduce_spark.mapreduce.job import INPUT_SCHEMA
from go_dfs_mapreduce_spark.mapreduce import plugins

# alphabet includes non-ASCII whitespace (\xa0 NBSP,   LS,
# ideographic space, \x1c FS): Python str.split() splits on all of these
# while Java's \s does not, so they pin the lowered twins' _PY_SPLIT_RE
# to the Python semantics (ADVICE r2: make the boundary explicit).
TEXT = st.text(
    alphabet="abcsXYZ012 \t.,!?-#ü€λ中\xa0 　\x1c", max_size=60
)

_STRIP = re.compile(r"[^a-zA-Z0-9]+")

SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(lines=st.lists(TEXT, min_size=1, max_size=6))
@SET
def test_mr_wordcount_totals_match_naive_python(spark, lines):
    """Distributed MR word count == naive in-process Counter, on arbitrary
    unicode lines (totals aggregated across reducers)."""
    rows = [(f"f{i}", i, line) for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, INPUT_SCHEMA)
    job = MapReduceJob(
        "prop_wc", plugins.word_count_map, plugins.word_count_reduce, r=5
    )
    got: Counter = Counter()
    for r in job.run(df).collect():
        word, cnt = r.line.rsplit("::", 1)
        got[word.rstrip()] += int(cnt)

    want: Counter = Counter()
    for line in lines:
        for t in line.lower().split():
            want[_STRIP.sub("", t)] += 1
    assert got == +want or dict(got) == dict(want)


@given(lines=st.lists(TEXT, min_size=1, max_size=5), r=st.integers(1, 26))
@SET
def test_partitioner_never_splits_a_key(spark, lines, r):
    """All occurrences of one key land on one reducer for every R."""
    rows = [(f"f{i}", i, line) for i, line in enumerate(lines)]
    df = spark.createDataFrame(rows, INPUT_SCHEMA)

    def m(file, ln, line, out):
        for t in line.split():
            out.extend([t, "1"])

    def red(keys, values, out):
        out.extend(sorted(set(keys)))

    job = MapReduceJob(f"prop_part_{r}", m, red, r=r)
    seen: dict[str, set[int]] = {}
    for row in job.run(df).collect():
        seen.setdefault(row.line, set()).add(row.r_id)
    assert all(len(s) == 1 for s in seen.values()), seen


@given(st.data())
@SET
def test_topk_is_prefix_of_full_order(spark, data):
    """top-k by (cnt desc, word) over any word multiset is a prefix of the
    fully ordered aggregate (SURVEY.md §5.4)."""
    words = data.draw(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "e1"]), min_size=1, max_size=30)
    )
    k = data.draw(st.integers(1, 5))
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(w,) for w in words], "word string")
    agg = df.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    full = [
        (r.word, r.cnt)
        for r in agg.orderBy(F.desc("cnt"), F.asc("word")).collect()
    ]
    top = [
        (r.word, r.cnt)
        for r in agg.orderBy(F.desc("cnt"), F.asc("word")).limit(k).collect()
    ]
    assert top == full[:k]


@given(lines=st.lists(TEXT, min_size=1, max_size=4))
@SET
def test_exact_dedup_idempotent(spark, lines):
    """Dedup of (corpus + its own duplicate) == dedup of corpus, with
    doubled copy counts for duplicated rows."""
    from pyspark.sql import functions as F

    norm = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    df1 = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "doc_id long, text string")
    df2 = df1.unionByName(
        spark.createDataFrame(
            [(i + 1000, l) for i, l in enumerate(lines)], "doc_id long, text string"
        )
    )

    def groups(df):
        return {
            r.k: r.n
            for r in df.select(norm.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    g1, g2 = groups(df1), groups(df2)
    assert set(g1) == set(g2)
    assert all(g2[k] == 2 * g1[k] for k in g1)


# URL-ish tokens chosen to hit every branch boundary of the log-analyzer
# normalization: bare schemes (domain strips to ''), leading '/' (find('/')
# == 0 does NOT split), '#'/'?' at path index 0 (no trim), numeric hosts
# with ':' first/last, multi-dot subdomain stripping. Tokens are ASCII;
# the SEPARATOR between tokens is drawn from Python str.split()'s
# whitespace set including non-ASCII members, pinning the lowered twin's
# _PY_SPLIT_RE to the Python tokenization (ADVICE r2).
URLISH = st.sampled_from(
    [
        "http://",
        "https://x",
        "http:///lead",
        "example.com",
        "a.b.c.org/p",
        "www.site.com/a/b?q=1",
        "10.0.0.1:8080/x",
        "10.0.0.1:",
        ":8080",
        "9y.z:80",
        "x.com/#frag",
        "x.com/?q",
        "x.com/p#f?both",
        "x.com/#f?q",   # '#' at path index 0 (no trim) + '?' later (trims)
        "x.com/?",      # '?' at path index 0 alone (no trim)
        "dot.",
        ".lead.dot/p",
        "plain",
        "a b",  # becomes two tokens after join
    ]
)
CRAWLER = st.sampled_from(["botA", "Bot-B", "x", "1digit", ""])
WS_SEP = st.sampled_from([" ", "\t", "\xa0", "　", "\x1c", "  "])


@given(
    entries=st.lists(st.tuples(CRAWLER, URLISH), min_size=1, max_size=5),
    r=st.integers(1, 10),
    sep=WS_SEP,
)
@SET
def test_lowered_log_analyzer_matches_python_simulation(spark, entries, r, sep):
    """The fully-lowered (FlatMapExpr + ReduceExpr) log-analyzer job must
    equal the pure-Python simulation of the reference's semantics on
    arbitrary log lines — including non-ASCII whitespace separators — for
    every reducer count."""
    from tests.test_mapreduce import simulate

    lines = [
        (f"f{i}", i, sep.join(["2024-01-01", "00:00:01", cr, url]))
        for i, (cr, url) in enumerate(entries)
    ]
    df = spark.createDataFrame(lines, INPUT_SCHEMA)
    job = MapReduceJob(
        "prop_la", plugins.log_analyzer_map, plugins.log_analyzer_reduce, r=r
    )
    got = sorted(tuple(x) for x in job.run(df).collect())
    want = simulate(
        lines, plugins.log_analyzer_map, plugins.log_analyzer_reduce, r
    )
    assert got == want


@given(
    toks=st.lists(st.text(alphabet="abc0", min_size=1, max_size=4), max_size=8),
    n=st.integers(2, 5),
)
@SET
def test_ngram_expr_matches_python_ngrams(spark, toks, n):
    """The shared ngram_expr builder (single source of truth for shingle
    construction across dedup/corpus/repetition/overlap operators) must
    equal the naive Python n-gramming for any token list and width."""
    from go_dfs_mapreduce_spark.operators.dedup import ngram_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(toks,)], "t array<string>")
    got = df.select(F.expr(ngram_expr("t", n)).alias("g")).first().g
    want = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ] if len(toks) >= n else []
    assert got == want


@given(
    lines=st.lists(
        st.text(alphabet="abXY 012.ü€λ中\xa0\t", max_size=40), min_size=1, max_size=20
    ),
    chunks=st.integers(1, 4),
)
@SET
def test_dfs_chunk_writer_reader_roundtrip(spark, tmp_path_factory, lines, chunks):
    """go_dfs_text write -> read round-trips arbitrary unicode lines in
    order across any chunking (the layout's contiguous chunk indices +
    per-chunk line numbers are a total order), and every chunk's sidecar
    is the md5 of its true bytes."""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.sources import register_dfs_sources

    register_dfs_sources(spark)
    node = str(tmp_path_factory.mktemp("dfsprop"))
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "seq long, value string"
    ).repartitionByRange(chunks, "seq")
    (
        df.sortWithinPartitions("seq")
        .select("value")
        .write.format("go_dfs_text")
        .option("file", "p.txt")
        .mode("append")
        .save(node)
    )
    for cf in _os.listdir(node):
        if cf.endswith("h") or cf == "chunks_tmp":
            continue
        with open(_os.path.join(node, cf), "rb") as fh:
            data = fh.read()
        with open(_os.path.join(node, cf + "h"), "rb") as fh:
            assert fh.read() == _h.md5(data).digest()
    back = (
        spark.read.format("go_dfs_text")
        .load(node)
        .orderBy("chunk_idx", "line_number")
        .select("line")
        .collect()
    )
    assert [r.line for r in back] == lines


# --- round 4: bufio line-scan semantics + streaming offset contiguity ----


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="\n", max_codepoint=0x2FF
            ),
            max_size=20,
        ),
        max_size=12,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_scan_lines_matches_bufio_simulation(lines, trailing_nl):
    """scan_lines == a direct simulation of Go's bufio.Scanner ScanLines:
    split on \\n, drop ONE trailing \\r per line, no phantom final empty
    line for newline-terminated data, last line kept at EOF without
    newline."""
    from go_dfs_mapreduce_spark.sources.dfs_chunks import scan_lines

    data = "\n".join(lines).encode("utf-8", "surrogatepass")
    if trailing_nl and lines:
        data += b"\n"
    # bufio simulation over the raw bytes
    want = []
    buf = data
    while buf:
        nl = buf.find(b"\n")
        if nl == -1:
            tok, buf = buf, b""
        else:
            tok, buf = buf[:nl], buf[nl + 1 :]
        if tok.endswith(b"\r"):
            tok = tok[:-1]
        want.append(tok.decode("utf-8", errors="replace"))
    assert list(scan_lines(data)) == want


@given(
    st.dictionaries(
        st.sampled_from(["a.txt", "b.txt", "c,d.txt"]),
        st.sets(st.integers(min_value=0, max_value=8), min_size=1),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=40, deadline=None)
def test_stream_offset_is_longest_contiguous_sidecarred_prefix(tmp_path_factory, idx_sets):
    """latestOffset reports, per file, the longest contiguous chunk
    prefix 0..n-1 present with sidecars — gaps hold the offset back."""
    import hashlib as _h
    import os as _os

    from go_dfs_mapreduce_spark.sources.dfs_chunks import _TextStreamReader

    node = str(tmp_path_factory.mktemp("offs"))
    for fname, idxs in idx_sets.items():
        for i in idxs:
            data = f"{fname}:{i}\n".encode()
            with open(_os.path.join(node, f"{fname}_t{i}"), "wb") as fh:
                fh.write(data)
            with open(_os.path.join(node, f"{fname}_t{i}h"), "wb") as fh:
                fh.write(_h.md5(data).digest())
    got = _TextStreamReader({"path": node}).latestOffset()["files"]
    for fname, idxs in idx_sets.items():
        n = 0
        while n in idxs:
            n += 1
        assert got.get(fname, 0) == n


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**31 - 1),
            st.integers(min_value=0, max_value=2**31 - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_packed_pair_key_roundtrip(spark, pairs):
    """The common-neighbors packed pair key (p1 << 32 | p2 via the same
    multiply/shiftright/mod SQL the operator uses) must roundtrip every
    id pair below 2^31 exactly — the id-width guard's safe region."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "p1 long, p2 long")
    out = (
        df.select(
            "p1", "p2",
            F.expr("p1 * 4294967296 + p2").alias("pk2"),
        )
        .select(
            "p1", "p2",
            F.shiftright("pk2", 32).alias("u1"),
            (F.col("pk2") % F.lit(1 << 32)).alias("u2"),
        )
        .collect()
    )
    for r in out:
        assert (r.u1, r.u2) == (r.p1, r.p2)


# ---------------------------------------------------------------------------
# BM25 rational-derivation equivalence (pure formula check, no Spark)
# ---------------------------------------------------------------------------


@given(
    data=st.lists(  # (dl, tf) per doc
        st.tuples(
            st.integers(min_value=1, max_value=500),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_bm25_rational_matches_textbook(data):
    """The exact-rational BM25 in operators/retrieval.py folds
    k1=1.2, b=0.75 into integer coefficients:

        tf_part = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)
        idf     = (2N - 2df + 1) / (2df + 1)

    This must equal the textbook pre-log form
        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    to float precision on every input — the derivation, executed."""
    data = [(dl, min(tf, dl)) for dl, tf in data]  # tf <= dl
    n = len(data)
    t = sum(dl for dl, _ in data)
    df = sum(1 for _, tf in data if tf > 0)
    k1, b = 1.2, 0.75
    avgdl = t / n
    for dl, tf in data:
        rational = ((2 * n - 2 * df + 1) / (2 * df + 1)) * (
            (22 * t * tf) / (10 * t * tf + 3 * t + 9 * dl * n)
        )
        textbook = ((n - df + 0.5) / (df + 0.5)) * (
            tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        )
        assert abs(rational - textbook) <= 1e-9 * max(1.0, abs(textbook))


# --- round-7 decomposition laws ------------------------------------------


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 500)),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_salted_two_phase_head_matches_naive(spark, pairs):
    """inverted_index_postings' salted two-phase top-H equals the naive
    single-window top-H for ANY data and any salt assignment — the
    per-(token, salt) top-H is a superset of the global top-H."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from go_dfs_mapreduce_spark.operators.retrieval import (
        POSTINGS_HEAD,
        POSTINGS_SALT,
    )

    tok = spark.createDataFrame(
        sorted(set(pairs)), "token string, doc_id long"
    )
    H = min(POSTINGS_HEAD, 7)  # small head so the law is exercised
    naive = (
        tok.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("token").orderBy("doc_id")),
        )
        .where(F.col("rn") <= H)
        .drop("rn")
    )
    salted = tok.withColumn(
        "salt", F.pmod(F.hash("doc_id"), F.lit(POSTINGS_SALT))
    )
    w1 = Window.partitionBy("token", "salt").orderBy("doc_id")
    surv = (
        salted.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= H)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("token").orderBy("doc_id")
    two_phase = (
        surv.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= H)
        .drop("rn")
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, two_phase.collect())
    )


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=150, unique=True))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_offset_rank_decomposition_matches_naive_window(spark, ids):
    """training_shuffle_shards' two-level (offset + rank-in-sub) position
    equals the naive whole-shard row_number for any doc_id population."""
    import duckdb
    import pyarrow as pa

    from go_dfs_mapreduce_spark.operators.training_prep import (
        SHUFFLE_SHARDS,
        training_shuffle_shards,
    )

    # drive the REGISTERED operator over a scratch documents table
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": ["x"] * len(ids)}),
            os.path.join(d, "documents.parquet"),
        )
        rows = training_shuffle_shards(spark, d).collect()
    got = {(r.doc_id): (r.shard, r.pos_in_shard) for r in rows}
    # naive reference: rank by (shuffle_key, doc_id) within shard
    by_key = sorted(
        ((r.shard, r.shuffle_key, r.doc_id) for r in rows),
    )
    want: dict[int, tuple[int, int]] = {}
    counters: dict[int, int] = {}
    for shard, _, doc in by_key:
        counters[shard] = counters.get(shard, 0) + 1
        want[doc] = (shard, counters[shard])
    assert got == want
    assert {s for s, _ in got.values()} <= set(range(SHUFFLE_SHARDS))


def test_compaction_grid_laws():
    """_inc_compact_target: always strictly older than the batch minus
    KEEP, on the STEP grid, monotone in batch_id, and -1 before anything
    can fold — for every (KEEP, STEP) combination."""
    import go_dfs_mapreduce_spark.operators.streaming_batch as sb

    orig = (sb.INC_COMPACT_KEEP, sb.INC_COMPACT_STEP)
    try:
        for keep in (0, 1, 2, 3):
            for step in (1, 2, 3, 5):
                sb.INC_COMPACT_KEEP, sb.INC_COMPACT_STEP = keep, step
                prev = -1
                for bid in range(0, 40):
                    c = sb._inc_compact_target(bid)
                    assert c <= bid - 1 - keep or c == -1
                    assert c == -1 or (c + 1) % step == 0
                    assert c >= prev  # monotone: replay never sees younger
                    prev = c
    finally:
        sb.INC_COMPACT_KEEP, sb.INC_COMPACT_STEP = orig


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=2, max_size=8), min_size=1, max_size=12
    ),
    merges=st.integers(1, 3),
)
@settings(
    max_examples=6,  # each example is `merges` sequential Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_fold_matches_reference_greedy(spark, words, merges):
    """The in-row BPE merge fold (_BPE_FOLD) must equal reference greedy
    left-to-right merge application for ANY symbol sequence and winner —
    including shared-symbol runs ('aaaa' + (a,a) -> [aa, aa]) — across
    successive merges whose winners are recomputed the way the operator
    picks them (count desc, pair asc). Two-letter alphabet maximizes
    run/overlap collisions."""
    from collections import Counter

    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.textstats import _BPE_FOLD

    def ref_apply(syms, s1, s2):
        out = []
        for x in syms:
            if out and out[-1] == s1 and x == s2:
                out[-1] = s1 + s2
            else:
                out.append(x)
        return out

    state = [list(w) for w in words]
    for _ in range(merges):
        cnt = Counter(
            (s[i], s[i + 1]) for s in state for i in range(len(s) - 1)
        )
        if not cnt:
            break
        (s1, s2), _ = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want = [ref_apply(s, s1, s2) for s in state]
        df = spark.createDataFrame(
            [(s,) for s in state], "syms array<string>"
        ).crossJoin(
            spark.createDataFrame([(s1, s2)], "s1 string, s2 string")
        )
        got = [r.m for r in df.select(F.expr(_BPE_FOLD).alias("m")).collect()]
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        state = want


@given(
    ctx_a=st.text(alphabet="qwzx", min_size=0, max_size=40),
    ctx_b=st.text(alphabet="jkvf", min_size=0, max_size=40),
    core=st.text(alphabet="abcdefgh", min_size=31, max_size=60),
)
@SET
def test_winnowing_guarantee_shared_substring(ctx_a, ctx_b, core):
    """The winnowing theorem (Schleimer et al.): two documents sharing a
    substring of length >= WIN_K + WIN_W - 1 share at least one selected
    fingerprint, regardless of surrounding context. Exercised through
    the operator's own oracle SQL (DuckDB) on adversarial planted-core
    corpora — disjoint context alphabets ensure the shared content is
    only the core."""
    import duckdb

    from go_dfs_mapreduce_spark.operators.dedup import (
        WIN_K,
        WIN_W,
        WINNOW_ORACLE,
    )

    assert len(core) >= WIN_K + WIN_W - 1
    fp_sql = WINNOW_ORACLE.split("cold AS")[0].rstrip().rstrip(",")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute(
        "INSERT INTO documents VALUES (0, ?), (1, ?)",
        [ctx_a + core, core + ctx_b],
    )
    fps = con.execute(
        f"WITH {fp_sql.split('WITH', 1)[1]} SELECT doc_id, fp FROM fp"
    ).fetchall()
    a = {f for d, f in fps if d == 0}
    b = {f for d, f in fps if d == 1}
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


@given(
    texts=st.lists(
        st.text(
            alphabet="abcdef é ",  # incl. space runs + a non-ASCII char
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=25, deadline=None)
def test_winnow_poly_kernel_matches_pure_python_reference(texts):
    """The vectorized numpy rolling-hash kernel must select EXACTLY the
    fingerprints a transparent pure-Python implementation of the same
    polynomial/window-min definition selects, for arbitrary text
    (including shorter-than-K docs, sub-W gram counts, non-ASCII
    codepoints) — pinning the sliding-window matmul, the utf-32
    codepoint extraction, and the edge guards."""
    import re

    import pandas as pd

    from go_dfs_mapreduce_spark.operators.dedup import (
        WIN_B,
        WIN_K,
        WIN_M,
        WIN_W,
        _winnow_fast_kernel,
    )

    def norm(t):
        return re.sub(r"\s+", " ", t).strip().lower()

    def ref(doc):
        n = norm(doc)
        if len(n) < WIN_K:
            return set()
        hs = []
        for i in range(len(n) - WIN_K + 1):
            h = 0
            for ch in n[i : i + WIN_K]:
                h = (h * WIN_B + ord(ch)) % WIN_M
            hs.append(h)
        if len(hs) < WIN_W:
            return set()
        return {
            min(hs[j : j + WIN_W]) for j in range(len(hs) - WIN_W + 1)
        }

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "norm": [norm(t) for t in texts],
        }
    )
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for out in _winnow_fast_kernel([pdf]):
        for d, fp in zip(out["doc_id"], out["fp"]):
            got[int(d)].add(int(fp))
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (i, t)


@given(
    n_events=st.integers(0, 30),
    n_types=st.integers(1, 4),
    cuts=st.lists(st.integers(0, 30), max_size=4),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=40, deadline=None)
def test_seq_fold_batching_invariant_vs_naive(n_events, n_types, cuts, seed):
    """The vectorized trigram fold must emit the identical row multiset
    whether the stream arrives as one batch or any partition into
    micro-batches, and equal the naive per-event recurrence — pinning
    the state-prefix slicing math (k = live state size) across every
    state fill level."""
    import random

    import pandas as pd

    from go_dfs_mapreduce_spark.streaming.sequences import _fold_seq

    rng = random.Random(seed)
    rows = [
        (
            i,
            pd.Timestamp(2024, 1, 1) + pd.Timedelta(minutes=i),
            f"T{rng.randrange(n_types)}",
        )
        for i in range(n_events)
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type"])

    def naive():
        p1 = p2 = None
        out = []
        for eid, ts, et in rows:
            if p1 is not None and p2 is not None:
                out.append((7, ts, eid, f"{p1}>{p2}>{et}"))
            p1, p2 = p2, et
        return sorted(out)

    def run(bounds):
        p1 = p2 = None
        outs = []
        prev = 0
        for b in sorted(set(bounds + [n_events])):
            b = min(b, n_events)
            chunk = pdf.iloc[prev:b]
            prev = b
            p1, p2, out = _fold_seq(p1, p2, [chunk] if len(chunk) else [], 7)
            if out is not None:
                outs.extend(
                    (int(u), t, int(e), s)
                    for u, t, e, s in out.itertuples(False)
                )
        return sorted(outs)

    assert run([]) == naive()
    assert run(cuts) == naive()


def test_seq_fold_drops_null_event_types():
    """NULL event_type rows must be invisible to the streaming fold —
    the shared drop-nulls-at-source rule of all three sequence paths
    (batch plan, oracle CTE, this kernel). A naive str() fold would
    emit the literal 'None' where the batch twin skips the row."""
    import pandas as pd

    from go_dfs_mapreduce_spark.streaming.sequences import _fold_seq

    def mk(rows):
        return pd.DataFrame(
            [
                (i, pd.Timestamp(2024, 1, 1) + pd.Timedelta(minutes=i), et)
                for i, et in rows
            ],
            columns=["event_id", "ts", "event_type"],
        )

    with_null = mk([(0, "A"), (1, "B"), (2, None), (3, "C"), (4, "D")])
    without = mk([(0, "A"), (1, "B"), (3, "C"), (4, "D")])
    outs = []
    for pdf in (with_null, without):
        p1, p2, out = _fold_seq(None, None, [pdf], 7)
        assert (p1, p2) == ("C", "D")
        outs.append(
            sorted((int(e), s) for _, _, e, s in out.itertuples(False))
        )
    assert outs[0] == outs[1] == [(3, "A>B>C"), (4, "B>C>D")]
    assert not any("None" in s for _, s in outs[0])


@settings(deadline=None, max_examples=60)
@given(
    doc_id=st.integers(0, 10**6),
    w=st.integers(1, 16),
    h=st.integers(1, 12),
)
def test_png_and_gif_pixel_roundtrip_property(doc_id, w, h):
    """Every (doc_id, w, h) combination must roundtrip byte-exactly
    through both compressed-image codecs — doc_id rotates the PNG
    filter phase and the pixel/palette values, so the sweep exercises
    every filter alignment and LZW dictionary shape, not just the
    fixture's residue classes."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        make_gif_bytes,
        make_png_bytes,
    )

    pw, ph, px = decode_png_pixels(make_png_bytes(doc_id, w, h))
    assert (pw, ph) == (w, h)
    gw, gh, gx = decode_gif_pixels(make_gif_bytes(doc_id, w, h))
    assert (gw, gh) == (w, h)
    xs = np.arange(w).reshape(1, w)
    ys = np.arange(h).reshape(h, 1)
    assert np.array_equal(
        px[:, :, 0], (doc_id + 2 * xs + 3 * ys) % 256
    )
    assert np.array_equal(
        px[:, :, 1], (doc_id + 5 * xs + 7 * ys) % 256
    )
    assert np.array_equal(
        px[:, :, 2], (doc_id + 11 * xs + 13 * ys) % 256
    )
    idx = (doc_id + 2 * xs + 3 * ys) % 256
    assert np.array_equal(gx[:, :, 0], idx)
    assert np.array_equal(gx[:, :, 1], (7 * idx) % 256)
    assert np.array_equal(gx[:, :, 2], (13 * idx) % 256)


@settings(deadline=None, max_examples=60)
@given(
    doc_id=st.integers(0, 10**6),
    channels=st.integers(1, 4),
    n=st.integers(1, 300),
)
def test_wav_pcm_roundtrip_property(doc_id, channels, n):
    """Every (doc_id, channels, frames) combination must roundtrip
    sample-exactly through the PCM codec, including channel counts the
    fixture never generates (3- and 4-channel interleaving)."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_wav_pcm,
        make_wav_pcm_bytes,
    )

    ch, got_n, s = decode_wav_pcm(make_wav_pcm_bytes(doc_id, channels, n))
    assert (ch, got_n) == (channels, n)
    fs = np.arange(n).reshape(n, 1)
    cs = np.arange(channels).reshape(1, channels)
    assert np.array_equal(s, (doc_id + 5 * fs + 11 * cs) % 4001 - 2000)


@settings(deadline=None, max_examples=60)
@given(
    doc_id=st.integers(0, 10**6),
    w=st.integers(1, 40),
    h=st.integers(1, 33),
    cut=st.floats(0.01, 0.99),
)
def test_jpeg_roundtrip_and_truncation_property(doc_id, w, h, cut):
    """Every (doc_id, w, h) block-constant JPEG roundtrips bit-exactly
    (arbitrary non-multiple-of-8 crops, arbitrary DC-difference signs
    and magnitudes), and any proper prefix quarantines under the strict
    EOI-at-end rule — the property-level twin of the fixture sweep."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_bytes,
    )

    b = make_jpeg_bytes(doc_id, w, h)
    dec = decode_jpeg_pixels(b)
    assert dec is not None
    jw, jh, px = dec
    assert (jw, jh) == (w, h)
    xs = np.arange(w).reshape(1, w)
    ys = np.arange(h).reshape(h, 1)
    assert np.array_equal(px, (doc_id + 2 * (xs // 8) + 3 * (ys // 8)) % 256)
    assert decode_jpeg_pixels(b[: int(len(b) * cut)]) is None
    assert decode_jpeg_pixels(make_jpeg_bytes(doc_id, w, h, progressive=True)) is None


@settings(deadline=None, max_examples=40)
@given(
    secs=st.lists(st.integers(0, 200_000), min_size=1, max_size=60),
    cuts=st.lists(st.integers(1, 58), max_size=4),
    seed=st.integers(0, 10**6),
)
def test_ratelimit_out_of_order_invariants_property(secs, cuts, seed):
    """For ANY arrival order and micro-batch split (including event-time
    regressions across batches), the clamped bucket holds its
    invariants: every emitted balance stays in [0, CAP], the persisted
    clock is the max event second seen, exactly one verdict per event,
    and an in-order split of the same events equals the one-fold batch
    truth (batching invariance)."""
    import random

    import pandas as pd

    from go_dfs_mapreduce_spark.streaming.ratelimit import (
        RL_CAP_MICRO,
        _fold_bucket,
    )

    rng = random.Random(seed)
    rows = [(i, pd.Timestamp(s, unit="s")) for i, s in enumerate(secs)]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    splits = sorted({c for c in cuts if c < len(shuffled)})
    parts, prev = [], 0
    for c in splits + [len(shuffled)]:
        if c > prev:
            parts.append(shuffled[prev:c])
            prev = c

    bal, last, out = None, None, []
    for part in parts:
        pdf = pd.DataFrame(part, columns=["event_id", "ts"])
        bal, last, o = _fold_bucket(bal, last, [pdf], user_id=7)
        out.extend(o)
    assert len(out) == len(rows)  # one verdict per event, none lost
    assert all(0 <= b <= RL_CAP_MICRO for *_, b in out)
    assert last == max(secs)  # the clock is monotone-max

    # in-order feeds are batching-invariant vs the single fold
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    one = _fold_bucket(None, None, [pd.DataFrame(ordered, columns=["event_id", "ts"])], 7)
    two_bal, two_last, two_out = None, None, []
    mid = len(ordered) // 2
    for part in (ordered[:mid], ordered[mid:]):
        if part:
            pdf = pd.DataFrame(part, columns=["event_id", "ts"])
            two_bal, two_last, o = _fold_bucket(two_bal, two_last, [pdf], 7)
            two_out.extend(o)
    assert (two_bal, two_last, two_out) == one


@settings(deadline=None, max_examples=60)
@given(
    doc_id=st.integers(0, 10**6),
    w=st.integers(1, 40),
    h=st.integers(1, 36),
    cut=st.floats(0.01, 0.99),
)
def test_jpeg420_roundtrip_and_truncation_property(doc_id, w, h, cut):
    """Every (doc_id, w, h) 4:2:0 color JPEG roundtrips bit-exactly —
    per-8x8-block luma, per-16x16-MCU chroma, nearest-neighbor upsample,
    YCbCr->RGB, arbitrary non-multiple-of-16 crops — and any proper
    prefix quarantines under the strict EOI-at-end rule (the 4:4:4
    property's subsampled twin)."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg420_bytes,
    )

    b = make_jpeg420_bytes(doc_id, w, h)
    dec = decode_jpeg_pixels(b)
    assert dec is not None
    jw, jh, px = dec
    assert (jw, jh) == (w, h) and px.shape == (h, w, 3)
    xs = np.arange(w).reshape(1, w)
    ys = np.arange(h).reshape(h, 1)
    yv = (doc_id + 2 * (xs // 8) + 3 * (ys // 8)) % 256
    cbd = 10 * ((doc_id + 5 * (xs // 16) + 7 * (ys // 16)) % 5 - 2)
    crd = 10 * ((doc_id + 11 * (xs // 16) + 13 * (ys // 16)) % 5 - 2)
    want = np.stack(
        [
            np.clip(np.rint(yv + 1.402 * crd), 0, 255),
            np.clip(
                np.rint(yv - 0.344136 * cbd - 0.714136 * crd), 0, 255
            ),
            np.clip(np.rint(yv + 1.772 * cbd), 0, 255),
        ],
        axis=-1,
    ).astype(np.int64)
    assert np.array_equal(px, want)
    assert decode_jpeg_pixels(b[: int(len(b) * cut)]) is None
    assert (
        decode_jpeg_pixels(make_jpeg420_bytes(doc_id, w, h, progressive=True))
        is None
    )


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ka", "lo", "mi", "ne", "po", "ra"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=3,
        max_size=7,
    ),
)
def test_span_dedup_family_matches_python_reference(spark, texts):
    """Differential property for the span-dedup family: on random small
    corpora over a 6-word alphabet (dense shared 3-grams), BOTH flag
    rules' merged spans equal an independent pure-Python reference of
    the stated semantics exactly — frequent = >= SPAN_DEDUP_MIN_DOCS
    distinct docs, owner = min doc_id, overlapping-or-adjacent merge —
    and every emitted span list is sorted, disjoint, and non-adjacent
    (the merge's fixed point)."""
    import re

    from go_dfs_mapreduce_spark.operators.dedup import (
        SPAN_DEDUP_MIN_DOCS,
        _span_dedup_keep_owner_spans,
        _span_dedup_spans,
    )

    docs = list(enumerate(texts))

    def ref(keep_owner):
        toks = {
            d: re.sub(r"\s+", " ", t).strip().lower().split(" ")
            for d, t in docs
        }
        occ, by_sh = {}, {}
        for d, tk in toks.items():
            if len(tk) < 3:
                continue
            for i in range(len(tk) - 2):
                sh = " ".join(tk[i : i + 3])
                occ.setdefault(d, []).append((i + 1, sh))
                by_sh.setdefault(sh, set()).add(d)
        owner = {
            sh: min(ds)
            for sh, ds in by_sh.items()
            if len(ds) >= SPAN_DEDUP_MIN_DOCS
        }
        out = {}
        for d, os_ in occ.items():
            flags = sorted(
                p
                for p, sh in os_
                if sh in owner and (not keep_owner or owner[sh] != d)
            )
            merged = []
            for p in flags:
                e = p + 2
                if merged and p <= merged[-1][1] + 1:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((p, e))
            if merged:
                out[d] = merged
        return out

    frame = spark.createDataFrame(docs, "doc_id long, text string")
    for fn, keep in (
        (_span_dedup_spans, False),
        (_span_dedup_keep_owner_spans, True),
    ):
        got = {}
        for r in fn(frame).collect():
            got.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_end)
            )
        got = {d: sorted(v) for d, v in got.items()}
        assert got == ref(keep), (keep, texts)
        for spans in got.values():
            for (s1, e1), (s2, _) in zip(spans, spans[1:]):
                assert s2 > e1 + 1  # disjoint AND non-adjacent


@settings(deadline=None, max_examples=60)
@given(doc_id=st.integers(0, 10**6), cut=st.integers(0, 10**9))
def test_y4m_roundtrip_and_truncation_property(doc_id, cut):
    """Every synthesized Y4M decodes back to the generator formulas
    (both chroma geometries, FRAME parameter tokens included), and every
    proper prefix either quarantines or — when the cut lands exactly on
    a frame boundary — decodes as the legal shorter stream with a
    frame-prefix of the same pixels (Y4M has no trailer, so both
    outcomes are correct; anything else is a desync bug)."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_y4m,
        make_y4m_bytes,
    )

    b = make_y4m_bytes(doc_id)
    dec = decode_y4m(b)
    assert dec is not None
    w, h, frames, rate = dec
    assert rate == (25, 1)  # the fixture's declared F token, surfaced
    assert (w, h) == ((doc_id % 9 + 1) * 2, (doc_id % 7 + 1) * 2)
    assert len(frames) == doc_id % 5 + 2
    full_chroma = doc_id % 4 == 0
    cw, ch = (w, h) if full_chroma else (w // 2, h // 2)
    xs, ys = np.arange(w).reshape(1, w), np.arange(h).reshape(h, 1)
    cxs, cys = np.arange(cw).reshape(1, cw), np.arange(ch).reshape(ch, 1)
    for f, (y, cb, cr) in enumerate(frames):
        assert np.array_equal(y, (doc_id + 2 * xs + 3 * ys + 17 * f) % 256)
        assert np.array_equal(cb, (doc_id + 5 * cxs + 7 * cys + 19 * f) % 256)
        assert np.array_equal(cr, (doc_id + 11 * cxs + 13 * cys + 23 * f) % 256)

    prefix = b[: cut % len(b)]  # every possible proper prefix, sampled
    got = decode_y4m(prefix)
    if got is not None:
        pw, ph, pframes, _ = got
        assert (pw, ph) == (w, h)
        assert 1 <= len(pframes) < len(frames)
        for a, bfr in zip(pframes, frames):
            assert all(np.array_equal(x, y) for x, y in zip(a, bfr))


def test_y4m_quarantine_cases():
    """The out-of-scope and malformed payloads all route to None: wrong
    magic, unsupported colorspace, odd dims under 420 chroma, missing
    dimensions, desynced frame marker, header-only stream, garbage
    between frames."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_y4m,
        make_y4m_bytes,
    )

    assert decode_y4m(b"") is None
    assert decode_y4m(b"RIFF1234") is None
    assert decode_y4m(b"YUV4MPEG2 W4 H4 C444\n") is None  # zero frames
    assert decode_y4m(b"YUV4MPEG2 W4 H4 C422\nFRAME\n" + bytes(32)) is None
    assert decode_y4m(b"YUV4MPEG2 W3 H4 C420\nFRAME\n" + bytes(18)) is None
    assert decode_y4m(b"YUV4MPEG2 W4 C444\nFRAME\n" + bytes(48)) is None
    assert decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAMEX\n" + bytes(12)) is None
    good = make_y4m_bytes(5)
    assert decode_y4m(good + b"junk") is None  # trailing garbage
    # C420 default when no C token: 2x2 -> Y 4 bytes + 2 chroma bytes
    got = decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(6))
    assert got is not None and got[0] == 2 and len(got[2]) == 1


@settings(deadline=None, max_examples=60)
@given(
    doc_id=st.integers(0, 10**6),
    w=st.integers(1, 40),
    h=st.integers(1, 33),
    cut=st.floats(0.01, 0.99),
)
def test_png_adam7_roundtrip_property(doc_id, w, h, cut):
    """Every Adam7-interlaced PNG decodes to EXACTLY the pixels of its
    sequential twin (the seven-pass scatter is lossless re-ordering),
    any proper prefix quarantines under the strict IEND rule, and the
    interlaced byte stream is genuinely different from the sequential
    one whenever the image has more than one pass."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_png_pixels,
        make_png_adam7_bytes,
        make_png_bytes,
    )

    il_bytes = make_png_adam7_bytes(doc_id, w, h)
    il = decode_png_pixels(il_bytes)
    seq = decode_png_pixels(make_png_bytes(doc_id, w, h))
    assert il is not None and seq is not None
    assert (il[0], il[1]) == (seq[0], seq[1]) == (w, h)
    assert np.array_equal(il[2], seq[2])
    assert decode_png_pixels(il_bytes[: int(len(il_bytes) * cut)]) is None


@settings(deadline=None, max_examples=60)
@given(doc_id=st.integers(0, 10**6), w=st.integers(1, 40), h=st.integers(1, 33))
def test_gif_interlace_roundtrip_property(doc_id, w, h):
    """Every genuinely interlaced GIF (rows stored in the four-pass
    Appendix E order) decodes to exactly the pixels of its sequential
    twin — the de-permutation is a lossless row reordering at any
    dimension, including heights where passes are empty."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        _gif_interlace_order,
        decode_gif_pixels,
        make_gif_bytes,
    )

    assert sorted(_gif_interlace_order(h)) == list(range(h))
    seq = decode_gif_pixels(make_gif_bytes(doc_id, w, h))
    il = decode_gif_pixels(make_gif_bytes(doc_id, w, h, interlaced=True))
    assert seq is not None and il is not None
    assert np.array_equal(seq[2], il[2])


@settings(deadline=None, max_examples=60)
@given(doc_id=st.integers(0, 10**6), cut=st.integers(0, 10**9))
def test_gif_animation_composite_and_truncation_property(doc_id, cut):
    """The animated-GIF decoder's final canvas equals an independent
    pure-Python painter's-algorithm replay of the synthesizer's
    geometry, per-frame delays match the formula, and EVERY proper
    prefix quarantines (the trailer-and-nothing-after contract means no
    prefix of an animation is a valid animation)."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_gif_frames,
        make_gif_anim_bytes,
    )

    b = make_gif_anim_bytes(doc_id)
    dec = decode_gif_frames(b)
    assert dec is not None
    w, h, delays, canvas, palette = dec
    assert (w, h) == (doc_id % 9 + 4, doc_id % 7 + 4)
    nf = doc_id % 4 + 2
    assert delays == [(doc_id + f) % 10 + 1 for f in range(nf)]
    expect = np.zeros((h, w), dtype=np.int64)
    for f in range(nf):
        if f == 0:
            left = top = 0
            fw, fh = w, h
        else:
            left = (doc_id + 3 * f) % (w - 1)
            top = (doc_id + 5 * f) % (h - 1)
            fw = max((w - left) // 2, 1)
            fh = max((h - top) // 2, 1)
        for y in range(top, top + fh):
            for x in range(left, left + fw):
                expect[y, x] = (doc_id + 2 * x + 3 * y + 29 * f) % 256
    assert np.array_equal(canvas, expect)
    assert np.array_equal(palette[:, 0], np.arange(256, dtype=np.uint8))
    assert decode_gif_frames(b[: cut % len(b)]) is None


@settings(deadline=None, max_examples=40)
@given(doc_id=st.integers(0, 10**6), cut=st.floats(0.01, 0.99))
def test_avi_mjpeg_roundtrip_and_truncation_property(doc_id, cut):
    """Every fixture AVI either roundtrips every frame's block-constant
    formula bit-exactly (non-quarantine docs, both index arms) or
    quarantines (the every-7th progressive arm), and any proper prefix
    quarantines under the strict RIFF-size rule."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        AVI_FRAME_SEED_STEP,
        decode_avi_mjpeg,
        make_avi_mjpeg_bytes,
    )

    b = make_avi_mjpeg_bytes(doc_id)
    dec = decode_avi_mjpeg(b)
    if doc_id % 7 == 0:
        assert dec is None
    else:
        w, h, frames = dec
        assert (w, h) == (doc_id % 21 + 4, doc_id % 17 + 4)
        assert len(frames) == doc_id % 4 + 2
        xs = np.arange(w).reshape(1, w)
        ys = np.arange(h).reshape(h, 1)
        for f, px in enumerate(frames):
            seed = doc_id + AVI_FRAME_SEED_STEP * f
            assert np.array_equal(
                np.asarray(px), (seed + 2 * (xs // 8) + 3 * (ys // 8)) % 256
            )
    assert decode_avi_mjpeg(b[: int(len(b) * cut)]) is None


@settings(deadline=None, max_examples=60)
@given(doc_id=st.integers(0, 10**6), cut=st.floats(0.01, 0.99))
def test_srt_roundtrip_and_truncation_property(doc_id, cut):
    """Every fixture SRT either roundtrips all cue timings and texts
    exactly or quarantines (the every-9th reversed-timestamp arm);
    truncation never raises (it either quarantines or yields a valid
    prefix of whole cues — SRT has no trailer, so a clean cut between
    blocks IS a well-formed shorter file)."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        make_srt_bytes,
        parse_srt,
    )

    b = make_srt_bytes(doc_id)
    cues = parse_srt(b)
    if doc_id % 9 == 0:
        assert cues is None
    else:
        nc = doc_id % 4 + 2
        assert len(cues) == nc
        phase = 137 * (doc_id % 13)
        for i, (s, e, t) in enumerate(cues):
            assert s == phase + 1700 * i
            assert e == s + 800 + 90 * ((doc_id + i) % 5)
            assert t == (
                f"cue {i} of doc {doc_id}\npace {(7 * doc_id + i) % 100}"
            )
    trunc = parse_srt(b[: int(len(b) * cut)])
    if trunc is not None and doc_id % 9 != 0:
        # a surviving parse must be a cue-prefix of the original: exact
        # timings, exact texts except the final cue's, which may be cut
        # mid-text (SRT carries no length fields, so a shorter text is
        # indistinguishable from a shorter caption — inherent to the
        # format, unlike the length-framed binary containers)
        assert [c[:2] for c in trunc] == [c[:2] for c in cues[: len(trunc)]]
        for k, (_, _, t) in enumerate(trunc[:-1]):
            assert t == cues[k][2]
        assert cues[len(trunc) - 1][2].startswith(trunc[-1][2])


@given(
    data=st.data(),
    n_rows=st.integers(0, 25),
    r_ids=st.integers(1, 5),
    split=st.booleans(),
)
@SET
def test_streamed_pull_files_equal_ordered_drain(
    spark, data, n_rows, r_ids, split
):
    """PROPERTY: the mid-job streamed result pull produces files
    byte-identical to the classic ordered job-end drain for ARBITRARY
    row sets and partitionings — r_id-partitioned plans take the
    concurrent per-partition path, round-robin plans split r_ids across
    partitions and must detect it and fall back; either way the bytes
    on disk are the same (correctness never rides on the plan shape,
    mapreduce/results.py)."""
    import os
    import shutil
    import tempfile

    from go_dfs_mapreduce_spark.mapreduce import results as results_mod

    rows = [
        (
            data.draw(st.integers(0, r_ids - 1)),
            seq,
            data.draw(st.text(alphabet="abXY01 .ü", max_size=8)),
        )
        for seq in range(n_rows)
    ]
    schema = "r_id int, seq int, line string"
    df = spark.createDataFrame(rows, schema)
    df = df.repartition(4) if split else df.repartition(4, "r_id")
    a = tempfile.mkdtemp(prefix="pull_prop_a_")
    b = tempfile.mkdtemp(prefix="pull_prop_b_")
    try:
        got = results_mod.stream_reducer_results(df, a)
        want = results_mod._ordered_drain(df, b, None)
        read = lambda d: {
            f: open(os.path.join(d, f)).read() for f in os.listdir(d)
        }
        assert read(a) == read(b)
        assert sorted(got) == sorted(want)
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)
