"""Tests for the LLM-pipeline operator families (dedup/similarity/
multimodal/textstats) beyond the oracle differential gate."""

from __future__ import annotations

import pytest


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = {}
    for r in ann_ivf_topk(spark, sf_dir).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)

    assert set(ivf) == set(exact)
    recalls = [len(ivf[q] & exact[q]) / len(exact[q]) for q in exact]
    # Quality canary only — IVF *correctness* is oracle-verified. The
    # synthetic labels are weak cosine clusters (max within-label cosine
    # ≈0.47), so recall@5 with n_probe=2/10 is modest by construction.
    assert sum(recalls) / len(recalls) >= 0.1, recalls


def test_ivf_cosines_match_exact_where_overlapping(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    for r in ann_ivf_topk(spark, sf_dir).collect():
        if (r.query_id, r.neighbor_id) in exact:
            assert r.cosine == exact[(r.query_id, r.neighbor_id)]


def test_decode_image_dispatches_all_formats_no_pillow():
    """The former pillow gate is closed (r11): decode_image dispatches
    every sniffed container to its pure decoder, quarantines junk, and
    the repo carries zero NotImplementedError stubs."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_image,
        make_bmp_pixel_bytes,
        make_gif_bytes,
        make_jpeg_bytes,
        make_png_bytes,
    )

    assert decode_image(b"\x89PNG fake") is None  # junk -> quarantine
    assert decode_image(b"") is None
    for payload, w, h in (
        (make_bmp_pixel_bytes(3, 5, 4, False), 5, 4),
        (make_png_bytes(3, 5, 4), 5, 4),
        (make_gif_bytes(3, 5, 4), 5, 4),
        (make_jpeg_bytes(3, 5, 4), 5, 4),
    ):
        dec = decode_image(payload)
        assert dec is not None and dec[0] == w and dec[1] == h


def test_exact_dedup_partitions_corpus(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.dedup import dedup_exact
    from go_dfs_mapreduce_spark.tables import table

    rows = dedup_exact(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_copies for r in rows) == n_docs
    assert all(r.n_copies >= 1 for r in rows)


def test_minhash_candidates_subset_of_jaccard_blocking(spark, sf_dir):
    """Every LSH candidate pair shares >=1 shingle, so it must appear in
    the full shingle-join pair set; and high-jaccard pairs should mostly
    surface as candidates (LSH recall on near-exact dups)."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    cand = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    strong = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    near_exact = {p for p, j in strong.items() if j >= 0.9}
    if near_exact:
        hit = len(near_exact & cand) / len(near_exact)
        assert hit >= 0.9, (hit, near_exact - cand)


def test_ngram_jaccard_guard_trips_on_hot_shingle_corpus(spark, tmp_path):
    """The exact baseline must REFUSE (distributed raise_error) when any
    shingle's document frequency exceeds max_doc_freq, instead of
    silently expanding a quadratic bucket (VERDICT r3: the uncapped
    baseline was a loaded gun with no guard)."""
    from go_dfs_mapreduce_spark.operators.dedup import dedup_ngram_jaccard

    hot_dir = str(tmp_path / "hotsf")
    docs = [
        (i, f"common hot shingle padding{i} tail{i} unique{i} words{i}")
        for i in range(8)
    ]  # every doc shares the 3-gram 'common hot shingle' -> df = 8
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{hot_dir}/documents.parquet"
    )
    with pytest.raises(Exception, match="exceeds the exact-baseline guard"):
        dedup_ngram_jaccard(spark, hot_dir, max_doc_freq=4).collect()
    # same corpus under the bound computes fine
    ok = dedup_ngram_jaccard(spark, hot_dir, max_doc_freq=8).collect()
    assert all(0.0 <= r.jaccard <= 1.0 for r in ok)


def test_pii_scrub_actually_detects_and_redacts(spark, sf_dir):
    """The oracle proves Spark==DuckDB; this proves the detectors FIRE
    (symmetric no-op regexes would still hash-match): every doc_id%7==0
    doc has its injected email counted and redacted out."""
    from go_dfs_mapreduce_spark.operators.scrubbing import pii_scrub_redact

    rows = {r.doc_id: r for r in pii_scrub_redact(spark, sf_dir).collect()}
    assert rows, "empty result"
    emails = [r for r in rows.values() if r.doc_id % 7 == 0]
    assert emails and all(r.n_emails >= 1 for r in emails)
    assert all(r.n_emails == 0 for r in rows.values() if r.doc_id % 7 != 0)
    phones = [r for r in rows.values() if r.doc_id % 11 == 0]
    assert phones and all(r.n_phones >= 1 for r in phones)
    ips = [r for r in rows.values() if r.doc_id % 13 == 0]
    assert ips and all(r.n_ips >= 1 for r in ips)


def test_url_canonicalizer_parity_on_adversarial_urls(spark):
    """The port-strip step is anchored to the AUTHORITY — pin engine
    parity on exactly the URLs the fixture never generates: ':443/'
    inside a path segment (must survive), multiple ':443/' occurrences
    (DuckDB without 'g' replaces only the first match — the anchor
    guarantees there IS at most one), and the plain happy path."""
    import duckdb

    from go_dfs_mapreduce_spark.operators.scrubbing import (
        _canon_duck,
        _canon_spark,
    )

    cases = {
        # authority port stripped, path ':443/' untouched
        "https://a.example.org:443/x/:443/y/": "https://a.example.org/x/:443/y",
        # ':443/' ONLY inside the path: nothing stripped
        "https://b.example.org/p/:443/q": "https://b.example.org/p/:443/q",
        # happy path: case + port + trailing slash
        "HTTPS://C.EXAMPLE.ORG:443/p/7/": "https://c.example.org/p/7",
        # non-443 port survives
        "https://d.example.org:8443/p": "https://d.example.org:8443/p",
    }
    raws = list(cases)
    got_spark = [
        r[0]
        for r in spark.createDataFrame(
            [(u,) for u in raws], "u string"
        ).selectExpr(_canon_spark("u")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {_canon_duck('?')}", [u]).fetchone()[0]
        for u in raws
    ]
    assert got_spark == got_duck == [cases[u] for u in raws]


def test_url_extraction_finds_injected_domains(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.scrubbing import url_extraction_topk

    rows = url_extraction_topk(spark, sf_dir).collect()
    assert rows and all(r.domain.endswith(".example.org") for r in rows)
    assert sum(r.n_urls for r in rows) > 0


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    ham = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash(spark, sf_dir).collect()
    }
    strong = [
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        if r.jaccard >= 0.9
    ]
    for pair in strong:
        if pair in ham:  # only comparable when both landed in one band
            assert ham[pair] <= 8


def test_fast_nn_matches_exact_formulation(spark, sf_dir):
    """numpy fast path == decimal-exact join formulation (neighbor ids
    must agree everywhere; cosines within 1e-9 — BLAS vs exact-decimal
    summation differ only in the last ulp)."""
    from go_dfs_mapreduce_spark.operators.dedup import embedding_nn_cosine
    from go_dfs_mapreduce_spark.operators.similarity import (
        embedding_nn_cosine_fast,
    )

    exact = {
        r.vec_id: (r.nn_vec_id, r.cosine)
        for r in embedding_nn_cosine(spark, sf_dir).collect()
    }
    fast = {
        r.vec_id: (r.nn_vec_id, r.cosine)
        for r in embedding_nn_cosine_fast(spark, sf_dir).collect()
    }
    assert set(fast) == set(exact)
    for vid, (nn, cos) in exact.items():
        fnn, fcos = fast[vid]
        assert fnn == nn, (vid, nn, fnn)
        assert abs(fcos - cos) < 1e-6


def test_image_header_roundtrip_and_garbage():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        make_image_bytes,
        parse_image_header,
    )

    for fmt in ("png", "gif", "bmp", "jpeg"):
        b = make_image_bytes(fmt, 317, 211)
        assert parse_image_header(b) == {
            "format": fmt, "width": 317, "height": 211,
        }
        # truncation must degrade to None, never raise
        assert parse_image_header(b[:5]) is None or fmt == "gif"
    assert parse_image_header(b"not an image") is None
    assert parse_image_header(b"") is None
    # JPEG marker scan: APP segments before SOF are skipped correctly
    jpeg = make_image_bytes("jpeg", 40, 30)
    assert parse_image_header(jpeg)["width"] == 40
    # bad segment length aborts the scan instead of looping
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x01" + b"\x00" * 8) is None


def test_bmp_pixel_decode_roundtrip():
    """The numpy BMP pixel decoder recovers the exact pixel grid from
    BOTH legal row orders (bottom-up positive height, top-down negative
    height) with stride padding in play, and degrades to None on
    truncated / unsupported payloads instead of raising."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_bmp_pixels,
        make_bmp_pixel_bytes,
    )

    for top_down in (False, True):
        # w=3 -> 9-byte rows padded to 12: padding + row order both live
        b = make_bmp_pixel_bytes(7, 3, 2, top_down)
        w, h, px = decode_bmp_pixels(b)
        assert (w, h) == (3, 2)
        for y in range(2):
            for x in range(3):
                assert tuple(int(v) for v in px[y, x]) == (
                    (7 + 2 * x + 3 * y) % 256,
                    (7 + 5 * x + 7 * y) % 256,
                    (7 + 11 * x + 13 * y) % 256,
                ), (top_down, x, y)
        assert px.dtype == np.uint8
    assert decode_bmp_pixels(b"BM" + bytes(20)) is None  # truncated
    assert decode_bmp_pixels(b"not a bmp") is None
    # 8-bpp and RLE-compressed BMPs are out of scope -> None, not garbage
    bad_bpp = bytearray(make_bmp_pixel_bytes(1, 2, 2, False))
    bad_bpp[28:30] = (8).to_bytes(2, "little")
    assert decode_bmp_pixels(bytes(bad_bpp)) is None
    bad_comp = bytearray(make_bmp_pixel_bytes(1, 2, 2, False))
    bad_comp[30:34] = (1).to_bytes(4, "little")
    assert decode_bmp_pixels(bytes(bad_comp)) is None


def test_png_pixel_decode_roundtrip_and_quarantine():
    """The stdlib PNG decoder recovers the exact pixel grid across all
    five filter types (the synthesizer rotates filter by row), and
    degrades to None on interlaced / truncated / CRC-corrupted /
    unsupported payloads instead of raising."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_png_pixels,
        make_png_bytes,
    )

    # h=7, doc_id=3 -> row filters (3+y) % 5 cover all five types
    b = make_png_bytes(3, 4, 7)
    w, h, px = decode_png_pixels(b)
    assert (w, h) == (4, 7)
    for y in range(7):
        for x in range(4):
            assert tuple(int(v) for v in px[y, x]) == (
                (3 + 2 * x + 3 * y) % 256,
                (3 + 5 * x + 7 * y) % 256,
                (3 + 11 * x + 13 * y) % 256,
            ), (x, y)
    assert px.dtype == np.uint8
    # interlace FLAG over sequential scanline data = malformed (the
    # byte length matches no real Adam7 layout at 4x7); genuine Adam7
    # streams now decode — see test_png_adam7_roundtrip_property.
    # Built locally: flip the IHDR interlace byte (offset 8 sig + 8
    # chunk header + 12 into the 13-byte IHDR data) and re-CRC the
    # chunk so only the flag lies, not the checksum.
    import zlib

    lying = bytearray(b)
    ihdr_data = bytearray(lying[16:29])
    ihdr_data[12] = 1
    lying[16:29] = ihdr_data
    lying[29:33] = zlib.crc32(b"IHDR" + bytes(ihdr_data)).to_bytes(4, "big")
    assert decode_png_pixels(bytes(lying)) is None
    # malformed payloads -> None
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(b[:30]) is None  # truncated mid-chunk
    corrupt = bytearray(b)
    corrupt[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    assert decode_png_pixels(bytes(corrupt)) is None
    idat_corrupt = bytearray(b)
    idat_corrupt[45] ^= 0xFF  # flip a byte inside IDAT (CRC now wrong)
    assert decode_png_pixels(bytes(idat_corrupt)) is None


def test_png_decoder_against_hand_filtered_bytes():
    """Decoder independence from the synthesizer: a 2x2 PNG is built BY
    HAND — known raw pixels, row 0 Sub-filtered and row 1 Up-filtered
    with hand-computed filter bytes — so a symmetric encoder/decoder
    bug cannot cancel out. The decoded grid must equal the stated
    pixels byte-for-byte."""
    import zlib

    from go_dfs_mapreduce_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png_pixels,
    )

    # raw scanlines (RGB): row0 = (10,20,30),(40,60,80)
    #                      row1 = (1,2,3),(5,7,9)
    # Sub on row0: [10,20,30, 40-10, 60-20, 80-30] = [10,20,30,30,40,50]
    # Up on row1:  [1-10, 2-20, 3-30, 5-40, 7-60, 9-80] mod 256
    row0 = bytes([1, 10, 20, 30, 30, 40, 50])
    row1 = bytes([2, 247, 238, 229, 221, 203, 185])
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 0]
    )
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(row0 + row1))
        + _png_chunk(b"IEND", b"")
    )
    w, h, px = decode_png_pixels(png)
    assert (w, h) == (2, 2)
    assert [tuple(int(v) for v in px[y, x]) for y in range(2) for x in range(2)] == [
        (10, 20, 30),
        (40, 60, 80),
        (1, 2, 3),
        (5, 7, 9),
    ]


def test_gif_lzw_roundtrip_and_quarantine():
    """The pure-Python LZW codec roundtrips streams that exercise every
    code path — deep dictionary growth, KwKwK chains, width bumps, and
    the 4096 dictionary reset — and the GIF container decode recovers
    the exact palette-mapped pixel grid — interlaced streams included
    (de-permuted, not quarantined, since late r12) — quarantining
    malformed payloads as None."""
    import random

    from go_dfs_mapreduce_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_gif_pixels,
        make_gif_bytes,
    )

    for trial in range(60):
        rng = random.Random(trial)
        n = rng.randrange(0, 1500)
        idx = (
            [rng.randrange(4) for _ in range(n)]
            if trial % 2
            else [7] * n  # maximal KwKwK chains
        )
        assert _lzw_decode(_lzw_encode(idx)) == idx, trial
    # force width growth through 9->12 bits and a 4096 table reset
    big = [(i * i) % 251 for i in range(60000)]
    assert _lzw_decode(_lzw_encode(big)) == big
    w, h, px = decode_gif_pixels(make_gif_bytes(9, 5, 4))
    assert (w, h) == (5, 4)
    for y in range(4):
        for x in range(5):
            i = (9 + 2 * x + 3 * y) % 256
            assert tuple(int(v) for v in px[y, x]) == (
                i,
                (7 * i) % 256,
                (13 * i) % 256,
            )
    # a genuinely interlaced stream decodes to the SAME pixels
    iw, ih, ipx = decode_gif_pixels(make_gif_bytes(9, 5, 4, interlaced=True))
    assert (iw, ih) == (5, 4) and (ipx == px).all()
    assert decode_gif_pixels(b"nope") is None
    assert decode_gif_pixels(make_gif_bytes(9, 5, 4)[:40]) is None


def test_pixel_decoders_quarantine_every_truncation_point():
    """EVERY prefix of a valid payload must decode to None or the full
    image — never raise (the r10 review reproduced a ValueError from a
    non-3-aligned GIF color-table cut, and PNG accepting streams cut
    before IEND). Exhaustive sweep over all truncation points of one
    representative file per format."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_png_pixels,
        make_bmp_pixel_bytes,
        make_gif_bytes,
        make_png_bytes,
    )

    cases = [
        (make_bmp_pixel_bytes(9, 5, 4, False), decode_bmp_pixels),
        (make_png_bytes(9, 5, 4), decode_png_pixels),
        (make_gif_bytes(9, 5, 4), decode_gif_pixels),
    ]
    for full, dec in cases:
        assert dec(full) is not None
        for cut in range(len(full)):
            got = dec(full[:cut])  # must not raise
            assert got is None, (dec.__name__, cut)


def test_wav_pcm_decode_roundtrip_quarantine_and_truncation():
    """The PCM decoder recovers the exact signed interleaved samples
    (both channel counts), quarantines non-integer-PCM format codes,
    and returns None (never raises) at EVERY truncation point."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_wav_pcm,
        make_wav_pcm_bytes,
    )

    for channels in (1, 2):
        b = make_wav_pcm_bytes(9, channels, 7)
        ch, n, s = decode_wav_pcm(b)
        assert (ch, n) == (channels, 7)
        for i in range(7):
            for c in range(channels):
                assert int(s[i, c]) == ((9 + 5 * i + 11 * c) % 4001) - 2000
        assert s.dtype == np.int64
    # IEEE-float format code -> quarantine
    assert decode_wav_pcm(make_wav_pcm_bytes(9, 2, 7, fmt_code=3)) is None
    full = make_wav_pcm_bytes(9, 2, 7)
    for cut in range(len(full)):
        assert decode_wav_pcm(full[:cut]) is None, cut
    assert decode_wav_pcm(b"RIFFxxxxWAVE") is None


def test_gif_lzw_decoder_against_hand_derived_codes():
    """Decoder independence from the compressor: the code stream for
    indices [1, 1, 1, 1] at min-code-size 2 is derived BY HAND —
    CLEAR(4), 1, then 6 == next_code (the KwKwK case, decoding to
    '1 1'), then 1 (whose table-add fills code 7, nc=8=2^3, bumping the
    width to 4 bits), then END(5) read at the bumped width. A decoder
    with the wrong KwKwK rule or the wrong bump point cannot read this
    stream."""
    from go_dfs_mapreduce_spark.operators.multimodal import _lzw_decode

    codes = [(4, 3), (1, 3), (6, 3), (1, 3), (5, 4)]
    acc, nbits, buf = 0, 0, bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    assert _lzw_decode(bytes(buf), min_code=2) == [1, 1, 1, 1]


def test_doc_chunking_reconstructs_token_stream(spark, sf_dir):
    """Concatenating each chunk's leading STRIDE tokens (all tokens for the
    final chunk) rebuilds every document's token stream exactly."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        CHUNK_STRIDE,
        doc_chunking,
    )
    from go_dfs_mapreduce_spark.operators.dedup import _NORM_SPARK
    from go_dfs_mapreduce_spark.tables import table

    chunks = doc_chunking(spark, sf_dir)
    rebuilt = (
        chunks.withColumn("t", F.expr("split(chunk_text, ' ')"))
        .withColumn(
            "head",
            F.expr(
                f"CASE WHEN n_tokens <= {CHUNK_STRIDE} THEN t "
                f"ELSE slice(t, 1, {CHUNK_STRIDE}) END"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(flatten(transform(array_sort(collect_list("
                "struct(chunk_idx, head))), x -> x.head)), ' ')"
            ).alias("rebuilt")
        )
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_NORM_SPARK).alias("norm")
    )
    bad = rebuilt.join(docs, "doc_id").where(F.col("rebuilt") != F.col("norm"))
    assert bad.count() == 0


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair lands in one cluster, and each cluster id is the
    min doc_id of its members (the deterministic fixpoint)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import (
        CLUSTER_MIN_JACCARD,
        dedup_clusters,
        dedup_minhash_lsh,
    )

    labels = dedup_clusters(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir).where(
        F.col("jaccard") >= CLUSTER_MIN_JACCARD
    )
    la = labels.select(F.col("doc_id").alias("doc_a"), F.col("cluster").alias("ca"))
    lb = labels.select(F.col("doc_id").alias("doc_b"), F.col("cluster").alias("cb"))
    split_pairs = (
        pairs.join(la, "doc_a").join(lb, "doc_b").where(F.col("ca") != F.col("cb"))
    )
    assert split_pairs.count() == 0
    bad_roots = (
        labels.groupBy("cluster")
        .agg(F.min("doc_id").alias("mn"))
        .where(F.col("cluster") != F.col("mn"))
    )
    assert bad_roots.count() == 0


def test_connected_components_star_rounds_log_not_diameter(spark):
    """The alternating large-star/small-star kernel labels a 129-hop
    chain correctly in O(log n) rounds — label propagation would need
    ~129 — and matches a driver-side union-find on adversarial shapes
    (chain, star, two blobs + bridge, isolated nodes, self-loops)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import connected_components

    def check(n, edges, max_rounds=64):
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        e = spark.createDataFrame(edges or [(0, 0)], "a long, b long")
        if not edges:
            e = e.where(F.lit(False))
        labels, rounds = connected_components(nodes, e, max_rounds)
        got = {r.doc_id: r.cluster for r in labels.collect()}
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps: dict[int, list] = {}
        for i in range(n):
            comps.setdefault(find(i), []).append(i)
        want = {x: min(ms) for ms in comps.values() for x in ms}
        assert got == want
        return rounds

    # 129-node chain: diameter 128, star rounds must be logarithmic
    rounds = check(129, [(i, i + 1) for i in range(128)])
    assert rounds <= 12, rounds
    # star graph converges immediately-ish
    assert check(20, [(0, i) for i in range(1, 20)]) <= 3
    # two dense blobs + one bridge, plus isolated nodes 20..24
    blob = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    blob += [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    check(25, blob + [(4, 10)])
    # self-loops and duplicate/reversed edges are harmless
    check(6, [(2, 2), (1, 3), (3, 1), (1, 3), (4, 5)])


def test_decontamination_flags_only_nonbenchmark_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        BENCH_MAX_DOC,
        decontaminate_vs_benchmark,
    )

    hits = decontaminate_vs_benchmark(spark, sf_dir)
    assert hits.where(F.col("doc_id") < BENCH_MAX_DOC).count() == 0
    assert hits.where((F.col("hit_ratio") <= 0) | (F.col("hit_ratio") > 1)).count() == 0


def test_repetition_scores_bounded_and_cover_corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.training_prep import (
        doc_repetition_scores,
    )
    from go_dfs_mapreduce_spark.tables import table

    rep = doc_repetition_scores(spark, sf_dir)
    n_docs = table(spark, sf_dir, "documents").count()
    # every doc in this corpus has >= 3 tokens, so none drop out
    assert rep.count() == n_docs
    bad = rep.where(
        (F.col("dup_trigram_ratio") < 0)
        | (F.col("dup_trigram_ratio") >= 1)
        | (F.col("top_token_ratio") <= 0)
        | (F.col("top_token_ratio") > 1)
    )
    assert bad.count() == 0


def test_label_centroids_shape_and_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.training_prep import (
        embedding_label_centroids,
    )
    from go_dfs_mapreduce_spark.tables import table

    cent = embedding_label_centroids(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert cent.count() == n_labels * 64
    # per-dimension vector counts must equal the label's vector count
    per_label = {r.label: r.c for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()}
    for r in cent.select("label", "n_vecs").distinct().collect():
        assert per_label[r.label] == r.n_vecs


def test_seq_length_buckets_conserve_docs_and_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.training_prep import (
        BUCKET_W,
        seq_length_buckets,
    )
    from go_dfs_mapreduce_spark.tables import table

    b = seq_length_buckets(spark, sf_dir)
    tot = b.agg(
        F.sum("n_docs").alias("d"),
        F.sum("padding_tokens").alias("p"),
        F.max(F.col("bucket_hi") - F.col("bucket_lo")).alias("w"),
    ).first()
    assert tot.d == table(spark, sf_dir, "documents").count()
    assert tot.p >= 0 and tot.w == BUCKET_W - 1
    # padded length never exceeds one bucket width per doc
    over = b.where(F.col("padding_tokens") >= F.col("n_docs") * BUCKET_W)
    assert over.count() == 0


def test_temperature_weights_normalize_and_flatten(spark, sf_dir):
    from go_dfs_mapreduce_spark.operators.training_prep import (
        source_temperature_weights,
    )

    rows = source_temperature_weights(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens: biggest source's weight share is SMALLER
    # than its raw token share, smallest source's is bigger
    tok_tot = sum(r.n_tokens for r in rows)
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.weight < big.n_tokens / tok_tot
    assert small.weight > small.n_tokens / tok_tot


def test_wav_header_roundtrip_and_garbage():
    from go_dfs_mapreduce_spark.operators.multimodal import (
        make_wav_bytes,
        parse_wav_header,
    )

    for ch, rate, bits, n in ((1, 8000, 8, 1), (2, 44100, 16, 500), (2, 22050, 16, 37)):
        h = parse_wav_header(make_wav_bytes(ch, rate, bits, n))
        assert h == {
            "channels": ch,
            "sample_rate": rate,
            "bits": bits,
            "n_samples": n,
        }
    assert parse_wav_header(b"") is None
    assert parse_wav_header(b"RIFFxxxxJUNK") is None
    assert parse_wav_header(b"\x89PNG\r\n\x1a\n") is None
    # truncated fmt chunk must not crash or return a bogus parse
    assert parse_wav_header(b"RIFF\x10\x00\x00\x00WAVEfmt ") is None


def test_frame_sample_counts_consistent(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.multimodal import (
        FRAME_STRIDE,
        multimodal_frame_sample,
    )

    fs = multimodal_frame_sample(spark, sf_dir)
    bad = fs.where(
        (F.col("n_sampled") != F.ceil(F.col("n_frames") / FRAME_STRIDE))
        | (F.col("sampled_sum_mod") < 0)
        | (F.col("sampled_sum_mod") >= 997)
    )
    assert bad.count() == 0


def test_doc_pack_bins_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.training_prep import (
        PACK_CAPACITY,
        doc_pack_bins,
    )
    from go_dfs_mapreduce_spark.tables import table

    packed = doc_pack_bins(spark, sf_dir)
    assert packed.count() == table(spark, sf_dir, "documents").count()
    # offsets live inside the bin, bins are non-negative
    bad = packed.where(
        (F.col("bin_offset") < 0)
        | (F.col("bin_offset") >= PACK_CAPACITY)
        | (F.col("bin_id") < 0)
    )
    assert bad.count() == 0
    # within a shard, (bin_id, bin_offset) is strictly increasing in
    # doc_id order — packing is sequential
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("doc_id")
    seq = packed.withColumn(
        "prev", F.lag(F.col("bin_id") * PACK_CAPACITY + F.col("bin_offset")).over(w)
    )
    disorder = seq.where(
        F.col("prev").isNotNull()
        & (F.col("bin_id") * PACK_CAPACITY + F.col("bin_offset") <= F.col("prev"))
    )
    assert disorder.count() == 0


def test_shingle_arrays_match_exploded_formulation(spark, sf_dir):
    """The one-shuffle collect_set array builder must produce exactly the
    per-doc distinct shingle sets of the exploded/distinct formulation
    (same docs dropped when too short, same sets, sz = set size)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import (
        _shingle_arrays,
        _shingles,
    )

    ref = (
        _shingles(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("ref_shs"))
    )
    got = _shingle_arrays(spark, sf_dir).select(
        "doc_id", F.sort_array("shs").alias("got_shs"), "sz"
    )
    j = ref.join(got, "doc_id", "full_outer")
    assert (
        j.where(
            "ref_shs IS NULL OR got_shs IS NULL OR ref_shs <> got_shs"
            " OR sz <> size(got_shs)"
        ).count()
        == 0
    )


def test_kmeans_iteration_does_not_increase_inertia(spark, sf_dir):
    """Lloyd's guarantee: total within-cluster squared distance after the
    iter-2 reassignment is <= the inertia of the iter-1 assignment to the
    raw seeds. Also: every cluster id is one of the K seed vec_ids, every
    vector is assigned exactly once, and each seed lands in its own
    cluster at distance 0 in iter 1."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.similarity import (
        K_CLUSTERS,
        _MICRO_ARR,
        _sqd_micro,
        kmeans_embeddings,
    )
    from go_dfs_mapreduce_spark.tables import table

    final = kmeans_embeddings(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    assert final.count() == n_vecs
    assert final.select("vec_id").distinct().count() == n_vecs

    # iter-1 inertia recomputed independently against the raw seeds
    xm = emb.select("vec_id", F.expr(_MICRO_ARR).alias("xm"))
    seeds = (
        xm.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(F.col("vec_id").alias("seed_id"), F.col("xm").alias("sm"))
    )
    d1 = xm.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "seed_id", F.expr(_sqd_micro("xm", "sm")).alias("d2")
    )
    iter1 = d1.groupBy("vec_id").agg(F.min("d2").alias("d2"))
    inertia1 = iter1.agg(F.sum("d2")).first()[0]
    inertia2 = final.agg(F.sum("d2_micro")).first()[0]
    assert inertia2 <= inertia1

    seed_ids = {r.seed_id for r in seeds.select("seed_id").collect()}
    clusters = {r.cluster for r in final.select("cluster").distinct().collect()}
    assert clusters <= seed_ids
    # seeds are distance 0 from themselves in iter 1
    zero = iter1.where(F.col("vec_id").isin(*seed_ids)).where(F.col("d2") != 0)
    assert zero.count() == 0


def test_cluster_safe_split_never_straddles_clusters(spark, sf_dir):
    """The leakage-control contract: every doc in a duplicate cluster
    lands on the same side, and both sides are nonempty at this SF."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.llm_extras import cluster_safe_split

    sp = cluster_safe_split(spark, sf_dir)
    mixed = sp.groupBy("cluster").agg(
        F.countDistinct("split").alias("n_sides")
    )
    assert mixed.where(F.col("n_sides") > 1).count() == 0
    sides = {r.split for r in sp.select("split").distinct().collect()}
    assert sides == {"train", "val"}


def test_token_budget_selection_is_maximal_prefix(spark, sf_dir):
    """Selection fills the budget: total <= budget, and no unselected doc
    could still fit at the cut point (the next doc in priority order
    would overflow)."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.llm_extras import (
        TOKEN_BUDGET,
        token_budget_selection,
    )

    sel = token_budget_selection(spark, sf_dir)
    total = sel.agg(F.max("cum_tokens")).first()[0]
    n_sel = sel.count()
    assert total <= TOKEN_BUDGET
    # cum_tokens is a strictly increasing prefix: max == sum of n_tokens
    assert total == sel.agg(F.sum("n_tokens")).first()[0]
    assert n_sel == sel.select("doc_id").distinct().count()


def test_dup_span_detection_handcrafted(spark):
    """Two docs share an exact 8-token run embedded at different offsets
    (unique filler elsewhere): each must report exactly one span covering
    that run — 4 five-grams, 8 tokens — at its own 1-based offset. The
    third doc shares nothing and must not appear. Also pins the
    MIN_GRAMS floor: a shared 6-token run (2 grams) is noise-dropped."""
    from go_dfs_mapreduce_spark.operators.dedup import dup_spans_from_docs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    short = "red orange yellow green blue violet"  # 6 tokens -> 2 grams
    docs = spark.createDataFrame(
        [
            (1, f"u1 u2 u3 {shared} u4 u5"),
            (2, f"v1 {shared} v2 v3 v4 v5 v6"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
            (4, f"x1 x2 {short} x3 x4"),
            (5, f"y1 y2 y3 y4 {short}"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        for r in dup_spans_from_docs(docs).collect()
    }
    # doc 1: shared run starts at token 4 (1-based), spans 8 tokens
    assert rows == {
        1: (4, 11, 8, 4),
        2: (2, 9, 8, 4),
    }


def _py_dup_spans(texts, k=5, min_grams=3):
    """Reference implementation of dup_span_detection in plain Python."""
    import re
    from collections import defaultdict

    toks = {
        d: re.sub(r"\s+", " ", t).strip().lower().split(" ")
        for d, t in texts.items()
    }
    grams = defaultdict(list)  # (doc, pos 1-based) lists per gram
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            grams[" ".join(ts[i : i + k])].append((d, i + 1))
    dup_pos = defaultdict(list)
    for g, occ in grams.items():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                dup_pos[d].append(p)
    spans = []
    for d, ps in dup_pos.items():
        ps.sort()
        run = [ps[0]]
        for p in ps[1:]:
            if p - run[-1] > k:
                spans.append((d, run))
                run = [p]
            else:
                run.append(p)
        spans.append((d, run))
    return {
        (d, run[0], run[-1] + k - 1, run[-1] - run[0] + k, len(run))
        for d, run in spans
        if len(run) >= min_grams
    }


def test_dup_span_detection_random_corpora(spark):
    """Distributed span pipeline == plain-Python reference on small
    random corpora with planted shared runs (deterministic seed)."""
    import random

    from go_dfs_mapreduce_spark.operators.dedup import dup_spans_from_docs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(4):
        shared = " ".join(rng.choices(vocab, k=rng.randint(5, 12)))
        texts = {}
        for d in range(6):
            fill = lambda n: " ".join(f"u{d}x{j}" for j in range(n))
            if d < rng.randint(2, 5):
                texts[d] = f"{fill(rng.randint(0,4))} {shared} {fill(rng.randint(0,4))}".strip()
            else:
                texts[d] = fill(rng.randint(6, 14))
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
            for r in dup_spans_from_docs(docs).collect()
        }
        assert got == _py_dup_spans(texts), f"trial {trial}"


def test_semantic_dedup_matches_brute_force_prune_rule(spark, sf_dir):
    """semantic_dedup's verdict column obeys its declared law exactly:
    pruned == 1 iff some same-cell vector with a smaller vec_id has
    round(cosine, 6) >= SEM_EPS. Brute-forced in Python over the smoke
    corpus using the operator's own cell assignment (nn_cells is itself
    oracle-verified through embedding_nn_cosine)."""
    import math

    from go_dfs_mapreduce_spark.operators.dedup import (
        SEM_EPS,
        nn_cells,
        semantic_dedup,
    )
    from go_dfs_mapreduce_spark.tables import table

    emb = {
        r.vec_id: r.embedding
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    cells = {}
    for r in nn_cells(spark, sf_dir).collect():
        cells.setdefault(r.cell, []).append(r.vec_id)

    def cos(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        return dot / math.sqrt(
            sum(a * a for a in u) * sum(b * b for b in v)
        )

    expect = {}
    for members in cells.values():
        for v in members:
            expect[v] = int(
                any(
                    u < v and round(cos(emb[u], emb[v]), 6) >= SEM_EPS
                    for u in members
                )
            )

    got = {r.vec_id: r.pruned for r in semantic_dedup(spark, sf_dir).collect()}
    assert got == expect
    # the smallest id in every cell is definitionally a survivor
    assert all(got[min(m)] == 0 for m in cells.values())
    # calibration canary: the prune set is non-trivial on this corpus
    assert 0 < sum(got.values()) < len(got)


def test_incremental_dedup_equals_full_lsh_restricted(spark, sf_dir):
    """The incremental ingest dedup must emit EXACTLY the full LSH pair
    set restricted to pairs whose b side is a new-batch doc — index
    pruning and the new-doc filter may drop corpus-only work, never
    change results. Also pins the split contract: every new_doc is above
    the id boundary, every match precedes its new doc, and matched_in
    says which side of the boundary the survivor sits on."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import (
        INC_SPLIT_DEN,
        INC_SPLIT_NUM,
        dedup_incremental_new_docs,
        dedup_minhash_lsh,
    )
    from go_dfs_mapreduce_spark.tables import table

    max_id = table(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0]
    t = (max_id * INC_SPLIT_NUM) // INC_SPLIT_DEN

    inc = dedup_incremental_new_docs(spark, sf_dir).collect()
    full = dedup_minhash_lsh(spark, sf_dir).collect()

    expected = {
        (r.doc_b, r.doc_a, r.jaccard) for r in full if r.doc_b > t
    }
    got = {(r.new_doc, r.matched_doc, r.jaccard) for r in inc}
    assert got == expected
    for r in inc:
        assert r.new_doc > t
        assert r.matched_doc < r.new_doc
        assert r.matched_in == ("corpus" if r.matched_doc <= t else "batch")


def test_ann_recall_audit_consistent_with_operators(spark, sf_dir):
    """The audit's per-query recall must equal the overlap of the two
    operators it composes, with n_exact = TOP_K rows per query."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_cosine_topk,
        ann_ivf_topk,
        ann_recall_audit,
    )

    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = {}
    for r in ann_ivf_topk(spark, sf_dir).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)

    rows = ann_recall_audit(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        hits = len(exact[r.query_id] & ivf.get(r.query_id, set()))
        assert r.n_exact == TOP_K
        assert r.n_hits == hits
        assert r.recall == round(hits / TOP_K, 6)
        assert 0.0 <= r.recall <= 1.0


def test_lsh_recall_audit_containment_and_totals(spark, sf_dir):
    """LSH verifies candidates against the same shingle sets as the
    exact baseline, so every LSH pair at or above the threshold is in
    truth: the audit's caught total must equal that count exactly, and
    every band obeys n_caught <= n_true with recall = n_caught/n_true."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        lsh_recall_audit,
    )

    n_truth = dedup_ngram_jaccard(spark, sf_dir).count()
    n_lsh_above = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .count()
    )
    rows = lsh_recall_audit(spark, sf_dir).collect()
    assert sum(r.n_true for r in rows) == n_truth
    assert sum(r.n_caught for r in rows) == n_lsh_above  # threshold subset
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        assert r.recall == round(r.n_caught / r.n_true, 6)


def test_dataset_mixture_plan_quota_arithmetic(spark, sf_dir):
    """Quotas must add back to ~the budget (within per-source rounding)
    and decompose exactly into full repeats plus a tail pass."""
    from go_dfs_mapreduce_spark.operators.training_prep import (
        TRAIN_TOKEN_BUDGET,
        dataset_mixture_plan,
    )

    rows = dataset_mixture_plan(spark, sf_dir).collect()
    assert rows
    total = sum(r.target_tokens for r in rows)
    assert abs(total - TRAIN_TOKEN_BUDGET) <= len(rows)  # rounding only
    for r in rows:
        assert r.full_repeats * r.n_tokens + r.tail_tokens == r.target_tokens
        assert 0 <= r.tail_tokens < r.n_tokens
        assert r.epochs == round(r.target_tokens / r.n_tokens, 6)


def test_hard_negative_mining_keeps_anchor_without_positive(spark, tmp_path):
    """An anchor whose label appears on no other vector must still emit
    its hard negatives — with a NULL positive ceiling, not a silently
    dropped row set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.similarity import (
        hard_negative_mining,
    )

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),   # anchor, label 7 unique
        (1, [0.9, 0.1, 0.0, 0.0], 1),
        (2, [0.8, 0.2, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 0.0], 2),
        (4, [0.0, 0.9, 0.1, 0.0], 2),
        (5, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    rows = hard_negative_mining(spark, str(tmp_path)).collect()
    anchor0 = [r for r in rows if r.anchor_id == 0]
    assert anchor0, "lonely-label anchor must keep its negatives"
    assert all(r.pos_ceiling is None for r in anchor0)
    assert all(r.is_semi_hard is None for r in anchor0)
    # anchors with same-label partners still get a ceiling
    anchor1 = [r for r in rows if r.anchor_id == 1]
    assert anchor1 and all(r.pos_ceiling is not None for r in anchor1)


def test_event_path_greedy_vs_first_touch(spark, tmp_path):
    """The greedy matcher advances through the path: a click BEFORE the
    first signup is ignored, a later one still matches — the case where
    first-touch funnel semantics (t_click <= t_signup => stage 1) and
    sequential matching disagree."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.timeseries import (
        event_path_conversion,
    )

    rows = [
        # user 1: click, THEN signup, then click, then purchase -> converts
        (1, "2024-01-01 00:00:00", 1, "click"),
        (2, "2024-01-01 01:00:00", 1, "signup"),
        (3, "2024-01-01 02:00:00", 1, "click"),
        (4, "2024-01-01 03:00:00", 1, "purchase"),
        # user 2: purchase before the click -> stuck at 2 steps
        (5, "2024-01-01 00:00:00", 2, "signup"),
        (6, "2024-01-01 01:00:00", 2, "purchase"),
        (7, "2024-01-01 02:00:00", 2, "click"),
        # user 3: never signs up
        (8, "2024-01-01 00:00:00", 3, "click"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": [r[3] for r in rows],
                "value": pa.array([0.0] * len(rows)),
                "props": ["{}"] * len(rows),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = {
        r.user_id: (r.steps_matched, r.converted, r.micros_to_convert)
        for r in event_path_conversion(spark, str(tmp_path)).collect()
    }
    assert got[1] == (3, True, 2 * 3600 * 1_000_000)  # signup@1h -> purchase@3h
    assert got[2] == (2, False, None)
    assert got[3] == (0, False, None)


def test_pmi_survives_degenerate_short_documents(spark, tmp_path):
    """0- and 1-token documents must contribute zero bigrams. Spark's
    sequence(1, 0) is the DESCENDING [1, 0], not empty — unguarded, a
    1-token doc indexes t[1] out of bounds (ANSI throw) and inflates
    n_bigrams. ADVICE r7 (high): guard verified on a corpus whose short
    docs would trip both failure modes, cross-checked against the DuckDB
    oracle whose range(1, 1) is correctly empty."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators import retrieval as rt

    # 6 copies of a two-token doc (pair count >= PMI_MIN_COUNT=5), plus
    # the degenerate tail: empty, whitespace-only, and 1-token docs
    texts = ["alpha beta"] * 6 + ["", "   ", "solo", "gamma"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = [
        (r.w1, r.w2, r.pair_count, r.pmi_ratio, r.rank)
        for r in rt.pmi_collocations(spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(rt.PMI_ORACLE).fetchall()]
    assert got == want
    # the one surviving pair: 6 alpha-beta bigrams out of exactly 6
    # corpus bigram positions (degenerate docs contribute none)
    assert len(got) == 1 and got[0][:3] == ("alpha", "beta", 6)


def test_lsh_topk_recall_and_candidate_discipline(spark, sf_dir):
    """ann_lsh_topk vs the brute-force baseline: (a) recall clears the
    floor the operator docstring derives for this corpus's weak
    (cosine ~0.35) neighbors, (b) where LSH returns a pair the exact
    operator also returned, the cosine agrees exactly (same scoring
    expression), and (c) the per-query top-k cap holds."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        ann_lsh_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh_rows = ann_lsh_topk(spark, sf_dir).collect()
    lsh = {(r.query_id, r.neighbor_id): r.cosine for r in lsh_rows}
    hit = set(exact) & set(lsh)
    recall = len(hit) / len(exact)
    assert recall >= 0.3, f"recall {recall} below the documented floor"
    for k in hit:
        assert lsh[k] == exact[k]  # identical exact-decimal scoring
    # per-query row cap holds
    from collections import Counter

    per_q = Counter(q for q, _ in lsh)
    assert all(v <= TOP_K for v in per_q.values())


def test_calibrated_lsh_bits_derivation_parity():
    """The Python derivation and the generated SQL CASE must agree on
    EVERY corpus size that can cross a threshold — proven by exhaustion
    over all boundary neighborhoods plus a coarse sweep (finite-domain
    rule: the thresholds are the whole behavior)."""
    import duckdb

    from go_dfs_mapreduce_spark.operators.similarity import (
        ANN_CAL_MAX_BITS,
        ANN_CAL_MIN_BITS,
        ANN_CAL_TARGET_BUCKET,
        _cal_bits_sql_case,
        calibrated_lsh_bits,
    )

    ns = {1, 2, 500, 2000, 50_000, 10**9}
    for b in range(ANN_CAL_MIN_BITS, ANN_CAL_MAX_BITS + 1):
        t = ANN_CAL_TARGET_BUCKET << b
        ns.update({t - 1, t, t + 1})
    con = duckdb.connect()
    case = _cal_bits_sql_case("n")
    got = dict(
        con.execute(
            f"SELECT n, {case} FROM (SELECT UNNEST(?) AS n)",
            [sorted(ns)],
        ).fetchall()
    )
    for n in sorted(ns):
        py = calibrated_lsh_bits(n)
        assert py == got[n], (n, py, got[n])
        assert ANN_CAL_MIN_BITS <= py <= ANN_CAL_MAX_BITS
        if py < ANN_CAL_MAX_BITS:  # the defining property of "smallest b"
            assert n <= ANN_CAL_TARGET_BUCKET << py
            if py > ANN_CAL_MIN_BITS:
                assert n > ANN_CAL_TARGET_BUCKET << (py - 1)
    # the documented anchor points
    assert calibrated_lsh_bits(500) == 4
    assert calibrated_lsh_bits(2000) == 6
    assert calibrated_lsh_bits(50_000) == 11


def test_calibrated_lsh_recall_and_batch_ab_consistency(spark, sf_dir):
    """(a) calibrated-width multiprobe recall vs brute clears the floor
    the multiprobe docstring measured for the fixed width (calibration
    targets BUCKET WIDTH, not recall — at sf0.01 bits drops 6 -> 4, so
    buckets are wider and recall can only rise); (b) where it returns a
    pair brute also returned, the cosine agrees exactly; (c) sig_bits is
    the documented derivation of the corpus size; (d) the 64-query batch
    pair agree with each other the same way."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        TOP_K,
        ann_cosine_batch_topk,
        ann_cosine_topk,
        ann_lsh_batch_topk,
        ann_lsh_calibrated_topk,
        calibrated_lsh_bits,
    )
    from go_dfs_mapreduce_spark.tables import table

    n = table(spark, sf_dir, "embeddings").count()
    want_bits = calibrated_lsh_bits(n)

    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    cal_rows = ann_lsh_calibrated_topk(spark, sf_dir).collect()
    assert {r.sig_bits for r in cal_rows} == {want_bits}
    cal = {(r.query_id, r.neighbor_id): r.cosine for r in cal_rows}
    hit = set(exact) & set(cal)
    assert len(hit) / len(exact) >= 0.4, "calibrated recall below floor"
    for k in hit:
        assert cal[k] == exact[k]
    from collections import Counter

    assert all(
        v <= TOP_K for v in Counter(q for q, _ in cal).values()
    )
    # batch A/B arms: same queries, same tie rule, index vs exhaustive
    bex = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_batch_topk(spark, sf_dir).collect()
    }
    blsh_rows = ann_lsh_batch_topk(spark, sf_dir).collect()
    assert {r.sig_bits for r in blsh_rows} == {want_bits}
    blsh = {(r.query_id, r.neighbor_id): r.cosine for r in blsh_rows}
    assert len(set(bex) & set(blsh)) / len(bex) >= 0.4
    for k in set(bex) & set(blsh):
        assert blsh[k] == bex[k]
    assert len({q for q, _ in bex}) == 64


def test_calibrated_ivf_consistency(spark, sf_dir):
    """ann_ivf_calibrated_topk: (a) n_cells is the documented sqrt-rule
    derivation of the corpus size; (b) where it returns a pair brute
    also returned, the cosine agrees exactly (same scoring expression);
    (c) per-query caps hold; (d) the cell-count rule's anchor points
    hold by exhaustive threshold check against the SQL CASE."""
    import duckdb

    from go_dfs_mapreduce_spark.operators.similarity import (
        TOP_K,
        _ivf_cells_sql_case,
        ann_cosine_topk,
        ann_ivf_calibrated_topk,
        calibrated_ivf_cells,
    )
    from go_dfs_mapreduce_spark.tables import table

    n = table(spark, sf_dir, "embeddings").count()
    want_k = calibrated_ivf_cells(n)
    rows = ann_ivf_calibrated_topk(spark, sf_dir).collect()
    assert {r.n_cells for r in rows} == {want_k}
    got = {(r.query_id, r.neighbor_id): r.cosine for r in rows}
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    for k_ in set(got) & set(exact):
        assert got[k_] == exact[k_]
    from collections import Counter

    assert all(v <= TOP_K for v in Counter(q for q, _ in got).values())
    # derivation parity by exhaustion over all threshold neighborhoods
    con = duckdb.connect()
    case = _ivf_cells_sql_case("n")
    ns = {1, 500, 2000, 50_000, 10**9}
    for j in range(3, 13):
        t = 1 << (2 * j)
        ns.update({t - 1, t, t + 1})
    sql = dict(
        con.execute(
            f"SELECT n, {case} FROM (SELECT UNNEST(?) AS n)", [sorted(ns)]
        ).fetchall()
    )
    for m in sorted(ns):
        assert calibrated_ivf_cells(m) == sql[m], m
    assert calibrated_ivf_cells(500) == 32
    assert calibrated_ivf_cells(2000) == 64
    assert calibrated_ivf_cells(50_000) == 256


def test_ann_lsh_batch_fast_equivalent_to_exact_twin(spark, sf_dir):
    """The numpy fast scorer must return the same (query, neighbor)
    top-k sets as the gate-verified exact-decimal twin, with cosines
    agreeing to the shared 6-decimal rounding (the
    embedding_nn_cosine_fast equivalence convention). Ranks may permute
    only within ties on the rounded cosine."""
    from collections import defaultdict

    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_lsh_batch_fast,
        ann_lsh_batch_topk,
    )

    exact = defaultdict(dict)
    for r in ann_lsh_batch_topk(spark, sf_dir).collect():
        exact[r.query_id][r.neighbor_id] = r.cosine
    fast = defaultdict(dict)
    for r in ann_lsh_batch_fast(spark, sf_dir).collect():
        fast[r.query_id][r.neighbor_id] = r.cosine
    assert set(exact) == set(fast)
    for qid in exact:
        assert set(exact[qid]) == set(fast[qid]), qid
        for nid, c in exact[qid].items():
            assert abs(fast[qid][nid] - c) <= 1e-6, (qid, nid)


def test_ann_cosine_batch_fast_equivalent_to_exact_twin(spark, sf_dir):
    """The partial-top-k numpy brute arm must match the gate-verified
    exact batch brute: same neighbor sets per query, cosines within the
    shared 6-decimal rounding."""
    from collections import defaultdict

    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_batch_fast,
        ann_cosine_batch_topk,
    )

    exact = defaultdict(dict)
    for r in ann_cosine_batch_topk(spark, sf_dir).collect():
        exact[r.query_id][r.neighbor_id] = r.cosine
    fast = defaultdict(dict)
    for r in ann_cosine_batch_fast(spark, sf_dir).collect():
        fast[r.query_id][r.neighbor_id] = r.cosine
    assert set(exact) == set(fast)
    for qid in exact:
        assert set(exact[qid]) == set(fast[qid]), qid
        for nid, c in exact[qid].items():
            assert abs(fast[qid][nid] - c) <= 1e-6, (qid, nid)


def test_token_diversity_handcrafted(spark, tmp_path):
    """Simpson diversity and TTR against hand-computed values: a looped
    phrase scores low, all-distinct prose scores the maximum 1 - 1/n,
    and empty/whitespace docs yield 0 tokens with NULL ratios."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        token_diversity_scores,
    )

    texts = [
        "spam spam spam spam",          # n=4, u=1, sumsq=16 -> simpson 0
        "a b c d",                      # n=4, u=4, sumsq=4 -> 1 - 4/16
        "x x y y",                      # n=4, u=2, sumsq=8 -> 1 - 8/16
        "",                             # degenerate: no tokens
        "   ",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.type_token_ratio,
                   r.simpson_diversity)
        for r in token_diversity_scores(spark, str(tmp_path)).collect()
    }
    assert got[0] == (4, 1, 0.25, 0.0)
    assert got[1] == (4, 4, 1.0, 0.75)
    assert got[2] == (4, 2, 0.5, 0.5)
    assert got[3] == (0, 0, None, None)
    assert got[4] == (0, 0, None, None)


def test_ks_drift_handcrafted(spark, tmp_path):
    """KS statistic against a hand-computed two-sample case: lengths
    {1,2,3,4} vs {3,4,5,6} -> ECDFs diverge most at value 2 (or 3-)
    where |2/4 - 0/4| = 0.5; and identical distributions -> KS 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        doc_length_ks_drift,
    )

    rows = (
        [("a", n) for n in (1, 2, 3, 4)]
        + [("b", n) for n in (3, 4, 5, 6)]
        + [("c", n) for n in (1, 2, 3, 4)]
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(["x" * n for _, n in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([s for s, _ in rows], pa.string()),
                "n_chars": pa.array([n for _, n in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.ks_num, r.ks_stat)
        for r in doc_length_ks_drift(spark, str(tmp_path)).collect()
    }
    assert got[("a", "b")] == (4, 4, 8, 0.5)   # sup at v=2: |2*4 - 0*4|
    assert got[("a", "c")] == (4, 4, 0, 0.0)   # identical -> 0
    assert got[("b", "c")] == (4, 4, 8, 0.5)
    assert len(got) == 3


def test_capped_jaccard_hot_correction_on_capped_corpus(spark, tmp_path):
    """The count-formulation verify (round-8 re-plan) on a corpus where
    the cap BITES: 60 docs share one ubiquitous shingle (df=60 > cap=50,
    dropped from pair generation) and two docs are exact duplicates.
    The dup pair must report jaccard 1.0 — its shared HOT shingle counts
    toward the intersection via the hot-correction branch even though it
    generated no candidate (without the correction: n=3 of sizes 4/4 ->
    0.6). The 60 hot-only docs must produce NO pairs. Cross-checked
    against the registered DuckDB oracle on the same corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators import dedup as dd

    texts = [f"alpha beta gamma uniq{i}a uniq{i}b" for i in range(60)]
    texts += ["alpha beta gamma delta epsilon zeta"] * 2  # doc 60, 61
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.dedup_ngram_jaccard_capped(spark, str(tmp_path)).collect()
    )
    assert got == [(60, 61, 1.0)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(dd.CAPPED_JACCARD_ORACLE).fetchall())
    assert got == want


def test_chi_square_drift_handcrafted(spark, tmp_path):
    """Hand-computed chi-square: two disjoint length distributions over a
    grid where every expected count is exactly 1 -> each source owes
    (2-1)^2 x2 + (0-1)^2 x2 = 4.0; and a source matching the pooled
    distribution scores 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        chi_square_source_drift,
    )

    rows = [("a", n) for n in (1, 1, 2, 2)] + [("b", n) for n in (3, 3, 4, 4)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(["x" * n for _, n in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([s for s, _ in rows], pa.string()),
                "n_chars": pa.array([n for _, n in rows], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r.source: (r.n_docs, r.chi2)
        for r in chi_square_source_drift(spark, str(tmp_path)).collect()
    }
    assert got == {"a": (4, 4.0), "b": (4, 4.0)}

    # a source whose histogram equals the pooled shape scores exactly 0
    rows2 = [(s, n) for s in ("c", "d") for n in (1, 2, 3, 4)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows2)), pa.int64()),
                "text": pa.array(["x" * n for _, n in rows2], pa.string()),
                "lang": pa.array(["en"] * len(rows2), pa.string()),
                "source": pa.array([s for s, _ in rows2], pa.string()),
                "n_chars": pa.array([n for _, n in rows2], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got2 = {
        r.source: r.chi2
        for r in chi_square_source_drift(spark, str(tmp_path)).collect()
    }
    assert got2 == {"c": 0.0, "d": 0.0}


def test_lsh_multiprobe_recall_dominates_plain(spark, sf_dir):
    """Hamming-1 multiprobe must strictly widen the candidate reach:
    recall vs brute force rises from ~0.4 to >= 0.6 on this corpus (the
    docstring's measured 0.76 with margin), the plain variant's result
    set is a SUBSET of the multiprobe top-k union per query only in
    score terms — every pair both return scores identically."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        ann_lsh_multiprobe_topk,
        ann_lsh_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    plain = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_lsh_topk(spark, sf_dir).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_lsh_multiprobe_topk(spark, sf_dir).collect()
    }
    r_plain = len(set(exact) & set(plain)) / len(exact)
    r_multi = len(set(exact) & set(multi)) / len(exact)
    assert r_multi >= 0.6, r_multi
    assert r_multi >= r_plain, (r_multi, r_plain)
    for k in set(multi) & set(exact):
        assert multi[k] == exact[k]


def test_fuzzy_levenshtein_handcrafted(spark, tmp_path):
    """Blocked edit-distance dedup semantics on a handcrafted corpus:
    a one-edit pair is caught with the exact distance, a same-prefix but
    heavily-rewritten pair falls below the threshold, a near-dup whose
    edit sits inside the blocking prefix is missed BY DESIGN (blocking
    contract), and the length-gap prune drops a same-prefix pair whose
    sizes cannot reach the threshold. Cross-checked against the DuckDB
    oracle on the same corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators import dedup as dd

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = [
        base,                                    # 0
        base.replace("lazy", "hazy"),            # 1: one edit, caught
        base[:24] + " completely different tail with other words etc",  # 2
        "xhe" + base[3:],                        # 3: edit INSIDE prefix -> other block
        base[:24] + " x",                        # 4: same prefix, tiny doc -> length-gap pruned
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = dd.dedup_fuzzy_levenshtein(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): (r.edit_dist, r.edit_sim) for r in rows}
    # the one-edit pair is the only survivor: doc 2 shares the block but
    # scores far below LEV_SIM_MIN; doc 3 landed in another block; doc 4
    # was pruned by the length gap before levenshtein ran
    assert set(got) == {(0, 1)}
    assert got[(0, 1)][0] == 1
    assert got[(0, 1)][1] == round(1.0 - 1.0 / len(base), 6)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        (a, b): (d, s)
        for a, b, d, s in con.execute(dd.FUZZY_LEV_ORACLE).fetchall()
    }
    assert got == want


def test_bpe_merge_candidates_handcrafted(spark, tmp_path):
    """BPE first-merge counts against hand-tallied values: 'banana banana
    band' yields an:5, na:4, ba:3, nd:1; single-letter runs contribute
    nothing; ranking is count-desc then pair-asc. Cross-checked against
    the DuckDB oracle on the same corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        BPE_MERGE_ORACLE,
        bpe_merge_candidates,
    )

    texts = ["banana banana band", "a b c", ""]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = [
        (r.pair, r.pair_count)
        for r in bpe_merge_candidates(spark, str(tmp_path)).collect()
    ]
    assert got == [("an", 5), ("na", 4), ("ba", 3), ("nd", 1)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(BPE_MERGE_ORACLE).fetchall()]


def test_zscore_anomalies_handcrafted(spark, tmp_path):
    """Rolling z-score semantics on a handcrafted stream: a spike after a
    12-row alternating baseline is flagged with the hand-derived score, a
    user with too little history is never scored, and a zero-variance
    baseline emits nothing (no 0/0 verdict). Cross-checked against the
    DuckDB oracle on the same corpus."""
    from datetime import datetime, timedelta

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.timeseries import (
        ZSCORE_ORACLE,
        events_user_zscore_anomalies,
    )

    t0 = datetime(2024, 1, 1)
    rows = []  # (event_id, ts, user_id, value)
    eid = 0
    # user 1: alternating 10/12 baseline (variance > 0), then a 100 spike
    for i in range(12):
        rows.append((eid, t0 + timedelta(hours=eid), 1, 10.0 if i % 2 == 0 else 12.0))
        eid += 1
    rows.append((eid, t0 + timedelta(hours=eid), 1, 100.0)); eid += 1
    # user 2: only 5 rows of history before its spike -> below ZS_MIN_HIST
    for i in range(5):
        rows.append((eid, t0 + timedelta(hours=eid), 2, 10.0 if i % 2 == 0 else 12.0))
        eid += 1
    rows.append((eid, t0 + timedelta(hours=eid), 2, 100.0)); eid += 1
    # user 3: constant baseline (variance 0), then a spike -> no verdict
    for i in range(12):
        rows.append((eid, t0 + timedelta(hours=eid), 3, 10.0)); eid += 1
    rows.append((eid, t0 + timedelta(hours=eid), 3, 100.0)); eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([r[3] for r in rows]),
                "props": ["{}"] * len(rows),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = {
        r.event_id: r.z_score
        for r in events_user_zscore_anomalies(spark, str(tmp_path)).collect()
    }
    # only user 1's spike is flagged
    assert set(got) == {12}
    # hand-derived: n=12, mean=11e6, sample var=12*(1e6)^2/11 (micro-units)
    import math

    n, vm = 12, 100_000_000
    s = 6 * 10_000_000 + 6 * 12_000_000
    ss = 6 * 10_000_000**2 + 6 * 12_000_000**2
    z = (n * vm - s) / (n * math.sqrt((n * ss - s * s) / (n * (n - 1.0))))
    assert got[12] == round(z, 4)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = {r[0]: r[4] for r in con.execute(ZSCORE_ORACLE).fetchall()}
    assert got == want


def test_bpe_train_merges_greedy_run_semantics(spark, tmp_path):
    """Three BPE merges on a corpus engineered around the shared-symbol
    run case: under winner (a, a), 'aaaa' must re-tokenize to [aa, aa]
    (greedy left-to-right — NOT three overlapping merges), making
    (aa, aa) the second learned rule. Cross-checked against the DuckDB
    recursive-CTE oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        _bpe_oracle,
        bpe_train_merges,
    )

    texts = ["aaaa aaaa ab", "x"]  # 'x' is a 1-letter run: contributes nothing
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = [
        (r.merge_step, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(spark, str(tmp_path))
        .orderBy("merge_step")
        .collect()
    ]
    # step 1: (a,a) x3 per 'aaaa' x2 occurrences = 6, beats (a,b)=1
    # step 2: 'aaaa' -> [aa, aa], so (aa,aa)=2 beats (a,b)=1
    # step 3: 'aaaa' -> [aaaa]; only (a,b)=1 remains
    assert got == [
        (1, "a", "a", 6),
        (2, "aa", "aa", 2),
        (3, "a", "b", 1),
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_bpe_oracle()).fetchall())
    assert got == want


def test_bpe_train_merges_batched_handcrafted(spark, tmp_path):
    """Batched BPE on a corpus engineered around every selection rule:
    round 1 must accept (a,b), SKIP (b,c) (shares b with an accepted
    pair), accept (c,d), SKIP (a,e) (shares a), then accept (f,g) and
    (h,i) — exhausting the candidates below the batch cap (the
    expectations hold at any M >= 4, so the r11 m=4 -> 8 promotion
    re-derives them unchanged); round 2 accepts the two survivors —
    counts as of ROUND START (the batched rule); round 3 has no pairs
    left and emits ZERO rows (empty-round path). Cross-checked against
    the recursive-CTE oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        _bpe_batched_oracle,
        bpe_train_merges_batched,
    )

    texts = [
        " ".join(
            ["ab"] * 10 + ["bc"] * 9 + ["cd"] * 8 + ["ae"] * 7
            + ["fg"] * 6 + ["hi"] * 5
        )
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges_batched(spark, str(tmp_path)).collect()
    )
    assert got == [
        (1, "a", "b", 10),
        (1, "c", "d", 8),
        (1, "f", "g", 6),
        (1, "h", "i", 5),
        (2, "a", "e", 7),
        (2, "b", "c", 9),
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(_bpe_batched_oracle()).fetchall()
    )
    assert got == want


def test_bpe_encode_corpus_handcrafted(spark, tmp_path):
    """Encoding with the trained merges, hand-derived on the greedy-run
    corpus: after merges (a,a), (aa,aa), (a,b) the word 'aaaa' encodes
    to ONE token (two stacked merges), 'ab' to one, 'x' to one — so
    doc0 ('aaaa aaaa ab') bills 3 BPE tokens for 10 chars and doc1
    ('x') 1 for 1. The BPE packing variant then bins by those real
    counts. Both cross-checked against their DuckDB oracles."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        BPE_ENCODE_ORACLE,
        bpe_encode_corpus,
    )
    from go_dfs_mapreduce_spark.operators.training_prep import (
        _pack_bpe_oracle,
        doc_pack_bins_bpe,
    )

    texts = ["aaaa aaaa ab", "x"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        tuple(r)
        for r in bpe_encode_corpus(spark, str(tmp_path)).collect()
    )
    assert got == [
        (0, 3, 10, 3, round(10 / 3, 6)),
        (1, 1, 1, 1, 1.0),
    ]
    pk = sorted(
        tuple(r) for r in doc_pack_bins_bpe(spark, str(tmp_path)).collect()
    )
    # shards 0 and 1, each starting its own bin at offset 0
    assert pk == [(0, 0, 3, 0, 0), (1, 1, 1, 0, 0)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == sorted(
        tuple(r) for r in con.execute(BPE_ENCODE_ORACLE).fetchall()
    )
    assert pk == sorted(
        tuple(r) for r in con.execute(_pack_bpe_oracle()).fetchall()
    )


def test_winnow_candidate_pairs_handcrafted(spark, tmp_path):
    """Winnowing semantics: a one-word edit between two long docs leaves
    their window minima mostly aligned (pair found, position-robust), an
    unrelated doc pairs with nothing, and a doc shorter than the gram
    length emits no fingerprints at all. Cross-checked against the
    DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.dedup import (
        WINNOW_ORACLE,
        winnow_candidate_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under the harvest moon and the river carries small "
        "boats toward the old stone bridge at the edge of town"
    )
    texts = [
        base,
        base.replace("waltz", "polka"),  # one mid-doc edit
        "completely different content about spark shuffles and parquet "
        "row groups and adaptive query execution and broadcast joins in "
        "a long enough paragraph to generate plenty of fingerprints",
        "too short",  # < WIN_K chars: no grams, no fingerprints
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = winnow_candidate_pairs(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r.shared_fps for r in rows}
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] >= 5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {(a, b): s for a, b, s in con.execute(WINNOW_ORACLE).fetchall()}
    assert got == want


def test_winnow_fast_matches_md5_twin(spark, tmp_path, sf_dir):
    """The rolling-polynomial production path selects with the SAME
    winnowing plan as the md5 gate twin — only the hash family differs.
    Pin equal candidate-pair sets on the handcrafted near-dup fixture
    (including the shared-fp count for the planted edit pair) and on the
    smoke corpus; at larger scale the sets may differ by boundary pairs
    where a different hash perturbs a window minimum (measured: 254 vs
    253 of 253 at sf0.1 — SCALE.md round 9)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.dedup import (
        winnow_candidate_pairs,
        winnow_candidate_pairs_fast,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under the harvest moon and the river carries small "
        "boats toward the old stone bridge at the edge of town"
    )
    texts = [base, base.replace("waltz", "polka"), "too short"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    fast = {
        (r.doc_a, r.doc_b)
        for r in winnow_candidate_pairs_fast(spark, str(tmp_path)).collect()
    }
    assert fast == {(0, 1)}
    smoke_md5 = {
        (r.doc_a, r.doc_b)
        for r in winnow_candidate_pairs(spark, sf_dir).collect()
    }
    smoke_fast = {
        (r.doc_a, r.doc_b)
        for r in winnow_candidate_pairs_fast(spark, sf_dir).collect()
    }
    assert smoke_md5 == smoke_fast
    assert len(smoke_md5) > 0


def test_gopher_rules_handcrafted(spark, tmp_path):
    """Gopher gate verdicts on engineered docs: a 60-word natural doc
    passes all rules; a 10-word doc fails only word-count; a doc of
    numeric tokens fails alpha-ratio (and stopwords); an empty doc fails
    everything with NULL ratios coalesced to FALSE. Cross-checked
    against the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        GOPHER_ORACLE,
        gopher_quality_rules,
    )

    good = " ".join(
        ["the quick brown fox and the lazy dog walk to market"] * 6
    )  # 66 words, stopwords the/and/to/a... distinct >= 2
    texts = [
        good,
        "the cat sat on a mat with the red hat now",  # 11 words < 50
        " ".join(["12345 67890"] * 30),  # 60 numeric words: alpha=0, no stops
        "",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = {
        r.doc_id: r
        for r in gopher_quality_rules(spark, str(tmp_path)).collect()
    }
    assert rows[0].passes_all
    assert not rows[1].rule_word_count and rows[1].rule_stopwords
    assert not rows[2].rule_alpha_words and not rows[2].rule_stopwords
    assert rows[2].rule_word_count  # 60 words is in range
    assert rows[3].n_words == 0 and not rows[3].passes_all
    assert rows[3].mean_word_len is None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {r[0]: tuple(r) for r in con.execute(GOPHER_ORACLE).fetchall()}
    got = {
        d: (
            d, r.n_words, r.mean_word_len, r.alpha_word_ratio,
            r.n_stop_distinct, r.rule_word_count, r.rule_mean_word_len,
            r.rule_alpha_words, r.rule_stopwords, r.passes_all,
        )
        for d, r in rows.items()
    }
    assert got == want


def test_cms_audit_guarantee_and_exactness(spark, tmp_path):
    """CMS audit on a hand-counted corpus: the top tokens carry their
    exact counts, every estimate satisfies the one-sided guarantee
    (estimate >= truth), and with far fewer tokens than buckets the
    estimates are collision-free and EQUAL truth. Cross-checked against
    the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.stats import (
        CMS_AUDIT_ORACLE,
        heavy_hitters_cms_audit,
    )

    texts = ["alpha alpha alpha beta beta gamma", "alpha beta delta"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = heavy_hitters_cms_audit(spark, str(tmp_path)).collect()
    got = {r.token: (r.exact_count, r.cms_estimate, r.never_underestimates) for r in rows}
    assert got["alpha"][0] == 4 and got["beta"][0] == 3
    assert got["gamma"][0] == 1 and got["delta"][0] == 1
    assert all(v[2] for v in got.values())
    # 4 tokens into 512 buckets x 4 rows: no collisions, estimates exact
    assert all(v[1] == v[0] for v in got.values())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(CMS_AUDIT_ORACLE).fetchall()}
    assert got == want


def test_cusum_alarms_match_sequential_reference(spark, tmp_path):
    """The window-native CUSUM (prefix-min identity) must equal the
    textbook sequential recursion S_i = max(0, S_{i-1} + (x_i - k)):
    a sustained shift alarms exactly at the reference's crossing row, a
    user below target never alarms, and a brief spike below h stays
    silent. Cross-checked against the DuckDB oracle."""
    from datetime import datetime, timedelta

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.timeseries import (
        CUSUM_ALARM_MICRO,
        CUSUM_ORACLE,
        CUSUM_TARGET_MICRO,
        events_cusum_alarms,
    )

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: 5 quiet rows (value 10), then a sustained 200-run
    for v in [10.0] * 5 + [200.0] * 6:
        rows.append((eid, t0 + timedelta(hours=eid), 1, v)); eid += 1
    # user 2: always below target
    for v in [10.0] * 8:
        rows.append((eid, t0 + timedelta(hours=eid), 2, v)); eid += 1
    # user 3: one 200-spike (single excursion below h), then quiet
    for v in [10.0] * 3 + [200.0] + [10.0] * 4:
        rows.append((eid, t0 + timedelta(hours=eid), 3, v)); eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([r[3] for r in rows]),
                "props": ["{}"] * len(rows),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = {
        (r.user_id, r.event_id): r.cusum_micro
        for r in events_cusum_alarms(spark, str(tmp_path)).collect()
    }

    # textbook sequential reference
    def ref(stream):
        alarms, s, prev = {}, 0, 0
        for eid_, v in stream:
            s = max(0, s + int(round(v * 1_000_000)) - CUSUM_TARGET_MICRO)
            if prev <= CUSUM_ALARM_MICRO < s:
                alarms[eid_] = s
            prev = s
        return alarms

    by_user = {}
    for e, _, u, v in rows:
        by_user.setdefault(u, []).append((e, v))
    want = {
        (u, e): s for u, st in by_user.items() for e, s in ref(st).items()
    }
    assert got == want
    assert {u for u, _ in got} == {1}  # only the sustained shift alarms
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = {
        (r[0], r[2]): r[3] for r in con.execute(CUSUM_ORACLE).fetchall()
    }
    assert got == oracle


def test_frequent_event_sequences_handcrafted(spark, tmp_path):
    """Sequence mining semantics: user 1's path A,B,C,A,B,C yields
    trigrams A>B>C (x2), B>C>A, C>A>B; user 2's 2-event path yields
    none; ties break lexically. Cross-checked against the DuckDB
    oracle. A NULL event_type row sits mid-path to pin the shared
    drop-nulls-at-source rule: without the filter Spark's concat_ws
    would skip the null (2-part 'B>C' string), DuckDB's || chain would
    emit NULL, and the engines would diverge."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.mining import (
        FREQ_SEQ_ORACLE,
        frequent_event_sequences,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, et in enumerate(["A", "B", "C", "A", "B", "C"]):
        rows.append((i, base + dt.timedelta(minutes=i), 1, et, 1.0, "{}"))
    rows.append(  # NULL event_type mid-path: must be invisible
        (20, base + dt.timedelta(minutes=2, seconds=30), 1, None, 1.0, "{}")
    )
    rows += [
        (10, base, 2, "A", 1.0, "{}"),
        (11, base + dt.timedelta(minutes=1), 2, "B", 1.0, "{}"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = [
        (r.seq, r.seq_count)
        for r in frequent_event_sequences(spark, str(tmp_path)).collect()
    ]
    assert got == [("A>B>C", 2), ("B>C>A", 1), ("C>A>B", 1)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(FREQ_SEQ_ORACLE).fetchall()]


def test_assoc_rules_handcrafted(spark, tmp_path):
    """Association-rule arithmetic, hand-derived: parts 1 and 2 co-occur
    in 3 of 5 baskets (support 3), part 1 appears in 4 and part 2 in 3,
    so conf(1->2)=0.75, conf(2->1)=1.0, lift=3*5/(4*3)=1.25; the (1,3)
    pair sits below MIN_SUPPORT and is dropped. Cross-checked against
    the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.mining import (
        ASSOC_ORACLE,
        assoc_rules_copurchase,
    )

    baskets = {
        1: [1, 2],
        2: [1, 2],
        3: [1, 2],
        4: [1, 3],
        5: [3, 4],
    }
    oks, pks = [], []
    for ok, items in baskets.items():
        for pk in items:
            oks.append(ok)
            pks.append(pk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(oks, pa.int64()),
                "l_partkey": pa.array(pks, pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = [
        tuple(r) for r in assoc_rules_copurchase(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 3, 4, 3, 0.75, 1.0, 1.25)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(ASSOC_ORACLE).fetchall()]


def test_assoc_rules_mega_basket_cap(spark, tmp_path):
    """The mega-basket cap drops oversized baskets BEFORE the self-join
    (VERDICT r9 #4): with cap=8, a synthesized 20-item basket
    contributes ZERO pairs and leaves the n_orders/lift universe, while
    the small baskets' rule is unchanged — pair volume stays bounded by
    |baskets| x cap^2 instead of the mega-basket's quadratic blowup.
    The oracle replays the identical cap."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.mining import (
        _assoc_oracle,
        assoc_rules_copurchase,
    )

    baskets = {
        1: [1, 2],
        2: [1, 2],
        3: [1, 2],
        4: [1, 2],
        # the mega basket: 20 distinct parts incl. 1 and 2 — above cap 8
        5: list(range(1, 21)),
    }
    oks, pks = [], []
    for ok, items in baskets.items():
        for pk in items:
            oks.append(ok)
            pks.append(pk)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(oks, pa.int64()),
                "l_partkey": pa.array(pks, pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    got = [
        tuple(r)
        for r in assoc_rules_copurchase(
            spark, str(tmp_path), max_basket=8
        ).collect()
    ]
    # mega basket gone: support 4 (not 5), n_orders 4 (not 5), no pair
    # involving parts 3..20 anywhere; lift = 4 * 4 / (4 * 4) = 1.0
    assert got == [(1, 2, 4, 4, 4, 1.0, 1.0, 1.0)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(_assoc_oracle(8)).fetchall()]
    # uncapped twin sees the mega basket: 1-2 support back to 5 with
    # n_orders 5 — pinning that the cap is what changed the universe
    unc = assoc_rules_copurchase(spark, str(tmp_path), max_basket=10**9)
    rows = {(r.part_a, r.part_b): tuple(r) for r in unc.collect()}
    assert rows[(1, 2)] == (1, 2, 5, 5, 5, 1.0, 1.0, 1.0)


def test_frequent_event_sequences_hot_user_cap(spark, tmp_path):
    """The hot-user cap drops a bot's path BEFORE collect_list builds
    its array (VERDICT r9 #5): with cap=6, a 12-event bot user's
    k-grams vanish while a normal user's survive; the oracle replays
    the identical cap via its HAVING filter."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.mining import (
        _freq_seq_oracle,
        frequent_event_sequences,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # normal user 1: path A,B,C,A -> trigrams A>B>C, B>C>A
    for i, et in enumerate(["A", "B", "C", "A"]):
        rows.append((i, base + dt.timedelta(minutes=i), 1, et, 1.0, "{}"))
    # bot user 2: 12 events looping X,Y -> would dominate the counts
    for i in range(12):
        rows.append(
            (100 + i, base + dt.timedelta(minutes=i), 2,
             "X" if i % 2 == 0 else "Y", 1.0, "{}")
        )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = [
        (r.seq, r.seq_count)
        for r in frequent_event_sequences(
            spark, str(tmp_path), max_user_events=6
        ).collect()
    ]
    assert got == [("A>B>C", 1), ("B>C>A", 1)]  # bot excluded entirely
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(_freq_seq_oracle(6)).fetchall()]
    # uncapped twin is dominated by the bot's loop — the cap is load-
    # bearing, not decorative
    unc = frequent_event_sequences(spark, str(tmp_path)).collect()
    assert ("X>Y>X" in {r.seq for r in unc})


def test_bigram_fluency_handcrafted(spark, tmp_path):
    """Fluency-score arithmetic, hand-derived: doc0 'a b a b' has
    bigrams [a b, b a, a b] with global counts {a b: 2, b a: 1, x y: 1}
    so sum=5, mean=5/3; doc1 'x y' scores 1.0; a 1-token doc drops out.
    Cross-checked against the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.textstats import (
        BIGRAM_FLUENCY_ORACLE,
        bigram_fluency_scores,
    )

    texts = ["a b a b", "x y", "solo"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        tuple(r) for r in bigram_fluency_scores(spark, str(tmp_path)).collect()
    )
    assert got == [
        (0, 3, 5, round(5 / 3, 6)),
        (1, 1, 1, 1.0),
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == sorted(
        tuple(r) for r in con.execute(BIGRAM_FLUENCY_ORACLE).fetchall()
    )


def test_embedding_outlier_topk_handcrafted(spark, tmp_path):
    """Outlier arithmetic, hand-derived on a 2-dim fixture: label 0's
    centroid of [0,0], [0,0], [3,4] is (1, 4/3); the [3,4] vector's
    squared distance 4 + (8/3)^2 = 100/9 ranks it first, the two
    origin vectors tie at 1 + 16/9 with the id tiebreak. (The DuckDB
    oracle is 64-dim-corpus-specific; the sf gate covers it — this
    pins the Spark arithmetic itself.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.similarity import (
        embedding_outlier_topk,
    )

    vecs = [
        (0, [0.0, 0.0], 0),
        (1, [0.0, 0.0], 0),
        (2, [3.0, 4.0], 0),
        (3, [1.0, 1.0], 1),
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    got = [
        (r.label, r.vec_id, r.rank, r.dist2)
        for r in embedding_outlier_topk(spark, str(tmp_path))
        .orderBy("label", "rank")
        .collect()
    ]
    mu0, mu1 = 1.0, 4.0 / 3.0
    d_far = round((3 - mu0) ** 2 + (4 - mu1) ** 2, 6)
    d_origin = round(mu0**2 + mu1**2, 6)
    assert got == [
        (0, 2, 1, d_far),
        (0, 0, 2, d_origin),
        (0, 1, 3, d_origin),
        (1, 3, 1, 0.0),
    ]


def test_span_corruption_plan_handcrafted(spark, tmp_path):
    """Span-plan semantics pinned against a transparent pure-Python
    replay of the same md5 layout (start gate, length draw, overlap
    merge) on a small corpus — including the empty doc (NULL ratio) and
    a 1-token doc."""
    import hashlib

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.training_prep import (
        SPAN_LEN_BASE,
        SPAN_PLAN_ORACLE,
        SPAN_START_MOD,
        span_corruption_plan,
    )

    texts = ["the quick brown fox jumps over the lazy dog " * 8, "one", ""]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    def h(doc_id, salt, i):
        m = hashlib.md5(f"{doc_id}:{salt}:{i}".encode()).hexdigest()
        return int(m[:15], 16)

    def ref(doc_id, text):
        toks = [t for t in " ".join(text.split()).lower().split(" ") if t]
        n = len(toks)
        starts = [h(doc_id, "S", i) % SPAN_START_MOD == 0 for i in range(1, n + 1)]
        lens = [SPAN_LEN_BASE + h(doc_id, "L", i) % 3 for i in range(1, n + 1)]
        masked = [
            any(
                starts[j - 1] and j + lens[j - 1] - 1 >= i
                for j in range(max(1, i - (SPAN_LEN_BASE + 1)), i + 1)
            )
            for i in range(1, n + 1)
        ]
        n_masked = sum(masked)
        n_spans = sum(
            1 for i in range(n) if masked[i] and (i == 0 or not masked[i - 1])
        )
        ratio = round(n_masked / n, 6) if n else None
        return (doc_id, n, n_masked, n_spans, ratio)

    got = sorted(
        tuple(r) for r in span_corruption_plan(spark, str(tmp_path)).collect()
    )
    want = sorted(ref(i, t) for i, t in enumerate(texts))
    assert got == want
    # real masking happened on the long doc
    assert got[0][2] > 0 and got[0][3] > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == sorted(
        tuple(r) for r in con.execute(SPAN_PLAN_ORACLE).fetchall()
    )


def test_rrf_score_parity_exhaustive_over_rank_domain(spark):
    """The RRF score's input domain is FINITE (ranks 1..FUSE_CAND or
    list-absent), so cross-engine float safety is provable by
    exhaustion: every (r_lex, r_sem) combination's rounded
    1/(C+r)-sum must be identical on Spark and DuckDB — including the
    NULL (single-list) cells. 2,600 cells, zero tolerance."""
    import duckdb
    import pyspark.sql.functions as F

    from go_dfs_mapreduce_spark.operators.retrieval import FUSE_CAND, RRF_C

    ranks = list(range(1, FUSE_CAND + 1)) + [None]
    rows = [(a, b) for a in ranks for b in ranks if not (a is None and b is None)]
    got = (
        spark.createDataFrame(rows, "r_lex long, r_sem long")
        .select(
            "r_lex",
            "r_sem",
            F.round(
                F.coalesce(1.0 / (RRF_C + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_C + F.col("r_sem")), F.lit(0.0)),
                6,
            ).alias("s"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        a = "NULL" if r.r_lex is None else r.r_lex
        b = "NULL" if r.r_sem is None else r.r_sem
        d = con.execute(
            f"SELECT ROUND(COALESCE(1.0/({RRF_C}+{a}),0.0)"
            f"+COALESCE(1.0/({RRF_C}+{b}),0.0),6)"
        ).fetchone()[0]
        assert float(d) == r.s, (r.r_lex, r.r_sem, float(d), r.s)


def test_shard_manifest_detects_corruption(spark, tmp_path):
    """The manifest's reason for existing: byte-identical corpora agree
    on every (count, total, checksum) row, and ANY single-document
    mutation — text corruption, a dropped doc, a duplicated doc —
    flips at least the affected shard's checksum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.training_prep import (
        training_shard_manifest,
    )

    def write(dirname, texts, ids=None):
        d = tmp_path / dirname
        d.mkdir()
        ids = list(range(len(texts))) if ids is None else ids
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts), pa.string()),
                    "source": pa.array(["t"] * len(texts), pa.string()),
                    "n_chars": pa.array(
                        [len(t) for t in texts], pa.int64()
                    ),
                }
            ),
            d / "documents.parquet",
        )
        return str(d)

    texts = [f"document number {i} with some words" for i in range(40)]

    def manifest(d):
        return sorted(
            tuple(r) for r in training_shard_manifest(spark, d).collect()
        )

    base = manifest(write("a", texts))
    assert base == manifest(write("b", texts))  # identical corpora agree
    # same lengths, one flipped character -> only the checksum changes
    corrupt = texts.copy()
    corrupt[7] = corrupt[7].replace("number", "numbex")
    got = manifest(write("c", corrupt))
    assert got != base
    assert [r[:4] for r in got] == [r[:4] for r in base]  # counts equal
    # dropped doc -> count and checksum change
    assert manifest(write("d", texts[:-1])) != base


def test_jpeg_block_constant_roundtrip_exact():
    """The gate query's lossless-by-construction corner: block-constant
    grayscale JFIFs decode back bit-exactly across many dims (including
    non-multiple-of-8 crops) and doc ids; the progressive (SOF2) arm
    quarantines."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_bytes,
        parse_image_header,
    )

    for doc_id in range(40):
        w, h = doc_id % 21 + 4, doc_id % 17 + 4
        b = make_jpeg_bytes(doc_id, w, h)
        assert parse_image_header(b) == {
            "format": "jpeg", "width": w, "height": h,
        }
        dec = decode_jpeg_pixels(b)
        assert dec is not None, (doc_id, w, h)
        W, H, px = dec
        assert (W, H) == (w, h)
        want = np.array(
            [
                [(doc_id + 2 * (x // 8) + 3 * (y // 8)) % 256 for x in range(w)]
                for y in range(h)
            ]
        )
        assert (px == want).all()
    assert decode_jpeg_pixels(make_jpeg_bytes(7, 10, 10, progressive=True)) is None


def test_jpeg_every_prefix_truncation_quarantines():
    """The shared truncation sweep of all binary decoders: every strict
    prefix of a valid JPEG must decode to None, never raise — the
    strict EOI-at-end trailer rule makes even header-complete prefixes
    malformed."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg_bytes,
    )

    b = make_jpeg_bytes(3, 12, 9)
    for i in range(len(b)):
        assert decode_jpeg_pixels(b[:i]) is None, i
    # trailing garbage after EOI is equally malformed
    assert decode_jpeg_pixels(b + b"\x00") is None


def test_jpeg_ac_path_differential_vs_reference_idct():
    """The AC entropy path (run-length symbols, ZRL, magnitude extend,
    full 2-D IDCT) can't ride the block-constant gate oracle (lossy in
    pixel space) — pin it at the COEFFICIENT level instead: random
    quantized blocks encode -> decode and must equal an independent
    O(n^4) textbook IDCT computed here, including a block with a
    >16-zero gap that forces ZRL emission."""
    import math

    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_encode_gray_blocks,
    )

    def ref_idct(coef):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv / 4 * coef[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                    out[x, y] = s
        return out

    rng = np.random.default_rng(17)
    blocks = [rng.integers(-40, 40, 64).tolist() for _ in range(3)]
    zrl_block = [0] * 64
    zrl_block[0], zrl_block[40], zrl_block[63] = 24, -7, 3  # forces ZRL
    blocks.append(zrl_block)
    w, h = 32, 8  # 4x1 blocks
    enc = jpeg_encode_gray_blocks([list(map(int, bl)) for bl in blocks], w, h)
    dec = decode_jpeg_pixels(enc)
    assert dec is not None
    _, _, px = dec
    for bi, bl in enumerate(blocks):
        coef = np.array(bl, dtype=np.float64).reshape(8, 8)
        want = np.clip(np.rint(ref_idct(coef)) + 128, 0, 255)
        assert (px[:, bi * 8 : (bi + 1) * 8] == want).all(), bi


def test_jpeg_three_component_ycbcr_to_rgb():
    """The color path: a 3-component 4:4:4 file with DC-only constant
    blocks decodes through interleaved MCUs and the standard YCbCr
    rounding — expected RGB computed independently here."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_encode_ycbcr_blocks,
    )

    def const_block(v):
        return [8 * (v - 128)] + [0] * 63

    # two MCUs with distinct (Y, Cb, Cr) constants, w=16 h=8, crop w=13
    trip0, trip1 = (90, 100, 180), (200, 60, 40)
    enc = jpeg_encode_ycbcr_blocks(
        [
            [const_block(c) for c in trip0],
            [const_block(c) for c in trip1],
        ],
        13,
        8,
    )
    dec = decode_jpeg_pixels(enc)
    assert dec is not None
    w, h, px = dec
    assert (w, h) == (13, 8) and px.shape == (8, 13, 3)

    def rgb(y, cb, cr):
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return [int(np.clip(np.rint(c), 0, 255)) for c in (r, g, b)]

    assert px[0, 0].tolist() == rgb(*trip0)
    assert px[7, 7].tolist() == rgb(*trip0)
    assert px[0, 8].tolist() == rgb(*trip1)
    assert px[7, 12].tolist() == rgb(*trip1)


def test_ann_int8_rerank_recall_vs_exact(spark, sf_dir):
    """The int8-scan + exact-rerank accelerated brute must agree with
    the full-precision exact brute almost everywhere: quantization
    error ~4e-3/dim reorders only near-ties, and R=32 stage-1 survivors
    absorb them before the k=5 cut. Where both rankings keep a pair,
    the exact-decimal cosine must be IDENTICAL (stage 2 recomputes it
    full-precision)."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        ann_int8_rerank_topk,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_int8_rerank_topk(spark, sf_dir).collect()
    }
    shared = set(exact) & set(got)
    assert len(shared) / len(exact) >= 0.8, (len(shared), len(exact))
    for k in shared:
        assert got[k] == exact[k]


def test_contamination_audit_conservation_and_handcrafted(
    spark, sf_dir, tmp_path
):
    """Contamination semantics pinned on an engineered corpus: doc 0
    (eval, doc_id % 31 == 0) copies most of its text from train doc 1
    -> contaminated; doc 31 (eval) is unique text -> clean; doc 62
    (eval) has ALL shingles in train (verbatim duplicate of doc 2) ->
    overlap_frac exactly 1.0. Plus the conservation law n_overlap <=
    n_shingles on the real corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_dfs_mapreduce_spark.operators.dedup import (
        contamination_ngram_audit,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = {
        0: shared + " iota kappa",             # eval: mostly from train 1
        1: shared + " lambda mu nu xi",        # train
        2: "one two three four five six",      # train
        31: "unique words nobody else wrote here at all",  # eval: clean
        62: "one two three four five six",     # eval: verbatim dup of 2
    }
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["t"] * len(ids), pa.string()),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    rows = {
        r.doc_id: r
        for r in contamination_ngram_audit(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {0, 31, 62}
    assert rows[0].contaminated is True and rows[0].overlap_frac < 1.0
    assert rows[31].n_overlap == 0 and rows[31].contaminated is False
    assert rows[62].overlap_frac == 1.0 and rows[62].contaminated is True
    for r in rows.values():
        assert 0 <= r.n_overlap <= r.n_shingles
    # the conservation law on the REAL corpus too (the docstring's
    # promise — would catch a lost distinctness guarantee upstream)
    real = contamination_ngram_audit(spark, sf_dir).collect()
    assert real
    for r in real:
        assert 0 <= r.n_overlap <= r.n_shingles


def test_pq_adc_duplicate_ranks_first_and_recall_floor(spark, sf_dir, tmp_path):
    """PQ-ADC invariants: (a) on an engineered corpus where vec 40 is a
    verbatim copy of query vec 0, the duplicate shares the query's
    codes, so its ADC distance equals the query's own quantization
    distortion - the minimum achievable (ADC is asymmetric, so it is
    NOT zero) - and it must rank FIRST for qid 0 with a strictly
    positive distance; (b) on the real corpus the recall@5 vs the
    exact brute stays above the measured floor (0.28 at both probed
    SFs - the documented isotropy ceiling, not operator noise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import numpy as np

    from go_dfs_mapreduce_spark.operators.similarity import (
        ann_cosine_topk,
        pq_adc_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.uniform(-0.9, 0.9, (48, 64))
    vecs[40] = vecs[0]  # verbatim duplicate of query 0
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(48), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float64()),
                ),
                "label": pa.array(["x"] * 48, pa.string()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    rows = pq_adc_topk(spark, str(tmp_path)).collect()
    q0 = [r for r in rows if r.query_id == 0]
    # select rank 1 explicitly — collect() order is not an API contract
    top = min(q0, key=lambda r: r.rank)
    assert top.neighbor_id == 40 and top.rank == 1
    assert top.adc_d2_micro > 0  # asymmetric: own-distortion, not 0
    # ...and minimal among qid 0's ranked candidates
    assert all(r.adc_d2_micro >= top.adc_d2_micro for r in q0)

    ex = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(spark, sf_dir).collect()
    }
    assert len(ex & got) / len(ex) >= 0.2


def test_ivf_pq_consistent_with_pq_and_cells(spark, sf_dir):
    """IVF-PQ composes the two registered single-family indexes, so two
    cross-operator invariants must hold exactly: (a) any (query,
    neighbor) pair ranked by BOTH ivf_pq_topk and pq_adc_topk carries
    the IDENTICAL integer ADC distance (same codebooks, same LUTs —
    routing only restricts the candidate set); (b) every ivf_pq
    neighbor's cell is one of its query's nprobe probed cells."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        IVF_CAL_NPROBE,
        calibrated_ivf_cells,
        ivf_cell_table,
        ivf_centroid_table,
        ivf_pq_topk,
        pq_adc_topk,
        _MICRO_ARR,
        _sqd_micro,
        N_QUERIES,
    )
    from go_dfs_mapreduce_spark.tables import table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    full = {
        (r.query_id, r.neighbor_id): r.adc_d2_micro
        for r in pq_adc_topk(spark, sf_dir).collect()
    }
    routed = ivf_pq_topk(spark, sf_dir).collect()
    assert routed
    for r in routed:
        key = (r.query_id, r.neighbor_id)
        if key in full:
            assert r.adc_d2_micro == full[key], key

    n = table(spark, sf_dir, "embeddings").count()
    k = calibrated_ivf_cells(n)
    cells = {
        r.vec_id: r.cluster
        for r in ivf_cell_table(spark, sf_dir, k).collect()
    }
    carr = ivf_centroid_table(spark, sf_dir, k)
    xm = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_MICRO_ARR).alias("xm")
    )
    probe = (
        xm.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("qid"),
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cluster")
            ),
        )
        .where(F.col("rn") <= IVF_CAL_NPROBE)
        .collect()
    )
    probed = {}
    for r in probe:
        probed.setdefault(r.qid, set()).add(r.cluster)
    for r in routed:
        assert cells[r.neighbor_id] in probed[r.query_id], r


def test_ivf_pq_rerank_dominates_raw_and_stays_in_shortlist(spark, sf_dir):
    """The r12 serve composition's two invariants: (a) every reranked
    row is one of its query's top-R ADC shortlist pairs and carries the
    shortlist's IDENTICAL integer ADC distance (stage 2 reorders, never
    re-scores stage 1); (b) per query, the reranked hit set against the
    exact brute CONTAINS the raw ivf_pq hit set — any true neighbor raw
    IVF-PQ surfaced is inside the R >> k shortlist, and the exact-cosine
    rerank cannot rank a true top-k neighbor below k within any subset
    containing it — so rerank recall >= raw recall on every query, the
    lift the audit measures. The audit's ivf_pq_rerank columns must
    agree with the directly recomputed hits."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        IVF_PQ_RERANK_R,
        _ivf_pq_adc,
        ann_cosine_topk,
        ann_quantized_recall_audit,
        ivf_pq_rerank_topk,
        ivf_pq_topk,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    adc, _k = _ivf_pq_adc(spark, sf_dir)
    w1 = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    shortlist = {
        (r.qid, r.cid): r.adc_d2
        for r in adc.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= IVF_PQ_RERANK_R)
        .collect()
    }
    rer = ivf_pq_rerank_topk(spark, sf_dir).collect()
    assert rer
    for r in rer:
        key = (r.query_id, r.neighbor_id)
        assert key in shortlist, key
        assert r.adc_d2_micro == shortlist[key], key

    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    raw = ivf_pq_topk(spark, sf_dir).collect()
    hits_raw, hits_rer = {}, {}
    for r in raw:
        if (r.query_id, r.neighbor_id) in exact:
            hits_raw.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in rer:
        if (r.query_id, r.neighbor_id) in exact:
            hits_rer.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid, got in hits_raw.items():
        assert got <= hits_rer.get(qid, set()), qid

    audit = ann_quantized_recall_audit(spark, sf_dir).collect()
    for row in audit:
        assert row.ivf_pq_rerank_hits == len(
            hits_rer.get(row.query_id, set())
        ), row
        assert row.ivf_pq_rerank_hits >= row.ivf_pq_hits, row


def test_jpeg420_every_prefix_truncation_quarantines():
    """The shared truncation sweep applied to the 4:2:0 encoder: every
    strict prefix of a valid subsampled color JPEG decodes to None,
    never raises, and trailing garbage after EOI is equally malformed."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        make_jpeg420_bytes,
    )

    b = make_jpeg420_bytes(3, 18, 17)  # partial MCUs on both axes
    for i in range(len(b)):
        assert decode_jpeg_pixels(b[:i]) is None, i
    assert decode_jpeg_pixels(b + b"\x00") is None


def test_jpeg420_rounding_domain_has_no_exact_halves():
    """The generator docstring's exhaustive claim: with luma 0..255 and
    chroma deltas in {-20,-10,0,10,20}, no YCbCr->RGB rounding input is
    an exact .5 double — so np.rint (half-to-even, the decoder) and SQL
    ROUND (half-away-from-zero, the oracle) agree on every reachable
    value."""
    ds = (-20, -10, 0, 10, 20)
    for y in range(256):
        for a in ds:
            for b in ds:
                for v in (
                    y + 1.402 * b,
                    y - 0.344136 * a - 0.714136 * b,
                    y + 1.772 * a,
                ):
                    assert v * 2 != round(v * 2) or v == round(v), (y, a, b)


def test_jpeg422_general_sampling_factors_decode():
    """The decoder's sampling generalization is not 4:2:0-specific: a
    hand-assembled 4:2:2 file (luma h=2 v=1, one chroma block per 16x8
    MCU) decodes with horizontal-only chroma upsample. Two MCUs with
    differing luma halves and differing chroma pin block order and the
    per-axis repeat factors."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        _huff_canonical,
        _jpeg_container,
        _jpeg_encode_block,
        _JPG_AC_BITS,
        _JPG_AC_VALS,
        _JPG_DC_BITS,
        _JPG_DC_VALS,
        _JpegBitWriter,
        decode_jpeg_pixels,
    )

    def const_block(v):
        return [8 * (v - 128)] + [0] * 63

    dc_map = {v: c for v, c in zip(_JPG_DC_VALS, _huff_canonical(_JPG_DC_BITS))}
    ac_map = {v: c for v, c in zip(_JPG_AC_VALS, _huff_canonical(_JPG_AC_BITS))}
    w = _JpegBitWriter()
    prev = [0, 0, 0]
    # MCU order for (2,1)/(1,1)/(1,1): Y-left, Y-right, Cb, Cr
    mcus = [
        (const_block(80), const_block(120), const_block(118), const_block(148)),
        (const_block(200), const_block(40), const_block(108), const_block(128)),
    ]
    for y0, y1, cb, cr in mcus:
        prev[0] = _jpeg_encode_block(w, y0, prev[0], dc_map, ac_map)
        prev[0] = _jpeg_encode_block(w, y1, prev[0], dc_map, ac_map)
        prev[1] = _jpeg_encode_block(w, cb, prev[1], dc_map, ac_map)
        prev[2] = _jpeg_encode_block(w, cr, prev[2], dc_map, ac_map)
    enc = _jpeg_container(
        w.finish(), 32, 8, 3, 0xC0, sampling=(0x21, 0x11, 0x11)
    )
    dec = decode_jpeg_pixels(enc)
    assert dec is not None
    dw, dh, px = dec
    assert (dw, dh) == (32, 8) and px.shape == (8, 32, 3)

    def rgb(y, cb, cr):
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return [int(np.clip(np.rint(c), 0, 255)) for c in (r, g, b)]

    assert px[0, 0].tolist() == rgb(80, 118, 148)    # MCU0 left luma
    assert px[7, 15].tolist() == rgb(120, 118, 148)  # MCU0 right luma
    assert px[0, 16].tolist() == rgb(200, 108, 128)  # MCU1 left luma
    assert px[7, 31].tolist() == rgb(40, 108, 128)   # MCU1 right luma


def test_contamination_audit_named_eval_table(spark, sf_dir):
    """The parameterized eval source (production shape): an external
    (doc_id, text) benchmark frame is shingled by the same rule and
    checked against the WHOLE corpus as train. A verbatim copy of a
    corpus doc must read overlap 1.0 / contaminated; a nonsense doc
    sharing no 3-gram must read 0 / clean; and the default mode must
    equal the registered query exactly."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        contamination_audit,
        contamination_ngram_audit,
    )
    from go_dfs_mapreduce_spark.tables import table

    src = (
        table(spark, sf_dir, "documents")
        .where("length(text) > 40")
        .select("text")
        .head(1)[0]
        .text
    )
    ev = spark.createDataFrame(
        [
            (900001, src),  # verbatim corpus doc -> fully contaminated
            (900002, "zzqx flurble womble grifnak plonk vexzor"),
            (900003, "two tokens"),  # too short for any 3-gram
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in contamination_audit(spark, sf_dir, eval_docs=ev).collect()
    }
    hit = rows[900001]
    assert hit.n_overlap == hit.n_shingles > 0
    assert hit.overlap_frac == 1.0 and hit.contaminated
    miss = rows[900002]
    assert miss.n_overlap == 0 and not miss.contaminated
    # the shingle-less doc still gets its clean row (r12 review finding)
    short = rows[900003]
    assert short.n_shingles == 0 and short.n_overlap == 0
    assert short.overlap_frac is None and short.contaminated is False

    # default mode == registered query
    got = sorted(
        map(tuple, contamination_audit(spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, contamination_ngram_audit(spark, sf_dir).collect())
    )
    assert got == want


def test_span_dedup_exact_boundaries_handcrafted(spark):
    """Exact merged-span boundaries on a handcrafted corpus: a 3-gram
    shared by >= 3 docs flags its positions; overlapping-or-ADJACENT
    covered ranges merge into one span; docs without repeated spans
    emit zeros in the plan."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        _span_dedup_spans,
        SPAN_DEDUP_MIN_DOCS,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "x alpha beta gamma y"),
            (3, "z z alpha beta gamma"),
            (4, "unrelated words only here"),
            # two occurrences of the frequent 3-gram at pos 1 and 4:
            # spans [1,3] and [4,6] are adjacent -> ONE merged span
            (5, "alpha beta gamma alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    assert SPAN_DEDUP_MIN_DOCS == 3
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in _span_dedup_spans(docs).collect()
    }
    assert spans == {1: (1, 3), 2: (2, 4), 3: (3, 5), 5: (1, 6)}


def test_span_dedup_apply_consistent_with_plan(spark, sf_dir):
    """The apply operator must agree with the plan it applies: per doc,
    removed tokens == the plan's n_dup_tokens and token totals match;
    a doc the plan leaves untouched must hash to its normalized text
    verbatim, and a doc the plan empties must hash to ''."""
    import hashlib

    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.dedup import (
        _NORM_SPARK,
        span_dedup_apply,
        span_dedup_plan,
    )
    from go_dfs_mapreduce_spark.tables import table

    plan = {
        r.doc_id: r for r in span_dedup_plan(spark, sf_dir).collect()
    }
    applied = {
        r.doc_id: r for r in span_dedup_apply(spark, sf_dir).collect()
    }
    assert set(plan) == set(applied)
    norm = {
        r.doc_id: r.norm
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_NORM_SPARK).alias("norm"))
        .collect()
    }
    for did, p in plan.items():
        a = applied[did]
        assert a.n_tokens == p.n_tokens, did
        assert a.n_removed == p.n_dup_tokens, did
        if p.n_spans == 0:
            want = hashlib.md5(norm[did].encode()).hexdigest()
            assert a.cleaned_md5 == want, did
        if p.n_dup_tokens == p.n_tokens:
            assert a.cleaned_md5 == hashlib.md5(b"").hexdigest(), did


def test_ivf_pq_residual_routing_and_recall(spark, sf_dir):
    """The residual variant shares ivf_pq_topk's routing exactly (every
    neighbor's assigned cell is one of its query's probed cells), emits
    nonnegative integer ADC distances, and clears the family's fixture
    recall floor against the exact brute."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        IVF_CAL_NPROBE,
        N_QUERIES,
        _MICRO_ARR,
        _sqd_micro,
        ann_cosine_topk,
        calibrated_ivf_cells,
        ivf_cell_table,
        ivf_centroid_table,
        ivf_pq_residual_topk,
    )
    from go_dfs_mapreduce_spark.tables import table
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = ivf_pq_residual_topk(spark, sf_dir).collect()
    assert rows
    assert all(r.adc_d2_micro >= 0 for r in rows)

    n = table(spark, sf_dir, "embeddings").count()
    k = calibrated_ivf_cells(n)
    assert all(r.n_cells == k for r in rows)
    cells = {
        r.vec_id: r.cluster
        for r in ivf_cell_table(spark, sf_dir, k).collect()
    }
    carr = ivf_centroid_table(spark, sf_dir, k)
    xm = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_MICRO_ARR).alias("xm")
    )
    probed = {}
    for r in (
        xm.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(carr))
        .select(
            F.col("vec_id").alias("qid"),
            "cluster",
            F.expr(_sqd_micro("xm", "cm")).alias("d2"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("d2", "cluster")
            ),
        )
        .where(F.col("rn") <= IVF_CAL_NPROBE)
        .collect()
    ):
        probed.setdefault(r.qid, set()).add(r.cluster)
    for r in rows:
        assert cells[r.neighbor_id] in probed[r.query_id], r

    ex = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(ex & got) / len(ex) >= 0.2


def test_jpeg_restart_intervals_roundtrip_and_quarantine():
    """DRI/RSTm support (r12): gray and 4:2:0 files encoded with a
    restart interval roundtrip bit-exactly (DC predictors reset at each
    marker), a WRONG restart index quarantines (a dropped/shuffled
    restart segment must never mis-splice), every strict prefix
    quarantines, and restart-free files are unaffected."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_encode_gray_blocks,
        make_jpeg420_bytes,
        make_jpeg_bytes,
    )

    # make_jpeg_bytes stamps doc_id % 3 == 0 with restart_interval=2 —
    # roundtrip both arms of both generators
    for doc_id in (3, 4):  # 3 -> restart arm, 4 -> plain arm
        for mk in (make_jpeg_bytes, make_jpeg420_bytes):
            dec = decode_jpeg_pixels(mk(doc_id, 33, 18))
            assert dec is not None and dec[:2] == (33, 18), (mk, doc_id)
    d = decode_jpeg_pixels(make_jpeg_bytes(3, 40, 24))
    xs = np.arange(40).reshape(1, 40)
    ys = np.arange(24).reshape(24, 1)
    assert np.array_equal(d[2], (3 + 2 * (xs // 8) + 3 * (ys // 8)) % 256)

    qb = [[8 * ((i * 13) % 256 - 128)] + [0] * 63 for i in range(8)]
    b = jpeg_encode_gray_blocks(qb, 64, 8, restart_interval=2)
    assert decode_jpeg_pixels(b) is not None
    i = b.find(b"\xff\xd0")
    assert i > 0
    bad = bytearray(b)
    bad[i + 1] = 0xD1  # wrong RST index
    assert decode_jpeg_pixels(bytes(bad)) is None
    for j in range(len(b)):
        assert decode_jpeg_pixels(b[:j]) is None, j


def test_span_dedup_keep_owner_boundaries_and_dominance(spark, sf_dir):
    """Keep-one-copy semantics: on the handcrafted corpus, the owner
    (min doc_id) of the repeated 3-gram keeps its occurrences — doc 1
    has NO spans where the uniform plan flags [1,3] — while non-owner
    docs flag exactly as the uniform rule does; and at corpus scale the
    keep-owner plan's n_dup_tokens is <= the uniform plan's for every
    doc."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        _span_dedup_keep_owner_spans,
        span_dedup_keep_owner,
        span_dedup_plan,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "x alpha beta gamma y"),
            (3, "z z alpha beta gamma"),
            (4, "unrelated words only here"),
            (5, "alpha beta gamma alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in _span_dedup_keep_owner_spans(docs).collect()
    }
    # doc 1 owns "alpha beta gamma" -> keeps it; others flag as before
    assert spans == {2: (2, 4), 3: (3, 5), 5: (1, 6)}

    uniform = {
        r.doc_id: r.n_dup_tokens
        for r in span_dedup_plan(spark, sf_dir).collect()
    }
    keep = {
        r.doc_id: r.n_dup_tokens
        for r in span_dedup_keep_owner(spark, sf_dir).collect()
    }
    assert set(uniform) == set(keep)
    assert all(keep[d] <= uniform[d] for d in uniform)
    # the owner rule must actually retain something somewhere: the
    # total removed strictly drops whenever any repeated shingle exists
    if sum(uniform.values()) > 0:
        assert sum(keep.values()) < sum(uniform.values())


def test_ivf_pq_residual_rerank_dominates_and_shares_stage1(spark, sf_dir):
    """The residual rerank composition: (a) every output pair is in the
    residual ADC top-R shortlist with the IDENTICAL integer distance;
    (b) per query its hit set vs the exact brute CONTAINS raw residual
    IVF-PQ's (the shortlist-containment argument of the raw rerank
    test)."""
    from go_dfs_mapreduce_spark.operators.similarity import (
        IVF_PQ_RERANK_R,
        _ivf_pq_residual_adc,
        ann_cosine_topk,
        ivf_pq_residual_rerank_topk,
        ivf_pq_residual_topk,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    adc, _k = _ivf_pq_residual_adc(spark, sf_dir)
    w1 = Window.partitionBy("qid").orderBy("adc_d2", "cid")
    shortlist = {
        (r.qid, r.cid): r.adc_d2
        for r in adc.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= IVF_PQ_RERANK_R)
        .collect()
    }
    rer = ivf_pq_residual_rerank_topk(spark, sf_dir).collect()
    assert rer
    for r in rer:
        key = (r.query_id, r.neighbor_id)
        assert key in shortlist and r.adc_d2_micro == shortlist[key], key

    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    raw = ivf_pq_residual_topk(spark, sf_dir).collect()
    hits_raw, hits_rer = {}, {}
    for r in raw:
        if (r.query_id, r.neighbor_id) in exact:
            hits_raw.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in rer:
        if (r.query_id, r.neighbor_id) in exact:
            hits_rer.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid, got in hits_raw.items():
        assert got <= hits_rer.get(qid, set()), qid


def test_span_dedup_incremental_consistent_with_base_index(spark, sf_dir):
    """The incremental plan covers exactly the docs above the split
    boundary, and a new doc's flagged budget can only SHRINK relative
    to the full-corpus plan when the batch's own arrivals were what
    pushed a shingle over the frequency threshold — so for docs the two
    plans both cover, incremental n_dup_tokens <= full n_dup_tokens."""
    from go_dfs_mapreduce_spark.operators.dedup import (
        INC_SPLIT_DEN,
        INC_SPLIT_NUM,
        span_dedup_incremental,
        span_dedup_plan,
    )
    from go_dfs_mapreduce_spark.tables import table
    from pyspark.sql import functions as F

    t = (
        table(spark, sf_dir, "documents")
        .agg(
            F.expr(
                f"(max(doc_id) * {INC_SPLIT_NUM}) div {INC_SPLIT_DEN}"
            ).alias("t")
        )
        .collect()[0]
        .t
    )
    inc = {
        r.doc_id: r for r in span_dedup_incremental(spark, sf_dir).collect()
    }
    assert inc and all(d > t for d in inc)
    full = {r.doc_id: r for r in span_dedup_plan(spark, sf_dir).collect()}
    assert set(inc) == {d for d in full if d > t}
    for d, r in inc.items():
        assert r.n_tokens == full[d].n_tokens, d
        assert r.n_dup_tokens <= full[d].n_dup_tokens, d


def test_audio_wht_parseval_and_quarantines(spark, sf_dir):
    """The WHT features' internal invariant (Parseval for the +/-1
    Hadamard basis: sum of ALL squared coefficients == 64 * sum of
    squared window samples) must hold on every emitted row — recomputed
    here from the generator formula — and the float-format and
    too-short arms quarantine."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        WHT_N,
        decode_wav_pcm,
        make_wav_pcm_bytes,
        multimodal_audio_wht,
    )

    rows = {r.doc_id: r for r in multimodal_audio_wht(spark, sf_dir).collect()}
    checked = 0
    for doc_id, r in rows.items():
        if r.channels == -1:
            assert doc_id % 7 == 0, doc_id
            continue
        window_energy = sum(
            ((doc_id + 5 * i) % 4001 - 2000) ** 2 for i in range(WHT_N)
        )
        total = sum(getattr(r, f"wht_b{b}") for b in range(8))
        assert total == WHT_N * window_energy, doc_id
        checked += 1
    assert checked > 0

    # a genuinely short PCM file (below the analysis window) quarantines
    short = make_wav_pcm_bytes(5, 1, WHT_N - 1)
    assert decode_wav_pcm(short) is not None  # decodable as PCM...
    from go_dfs_mapreduce_spark.operators.multimodal import _wht_matrix

    assert (_wht_matrix() @ _wht_matrix()).trace() == WHT_N * WHT_N


def test_priority_sampling_matches_pure_python_replay(spark, sf_dir):
    """Differential: the Spark priority sample equals an independent
    pure-Python replay of Duffield-Lund-Thorup on the same parquet —
    same 64 rows, same ranks, bit-identical est_weight doubles (the
    operator's claim that one exact multiply + one IEEE division is
    engine-portable)."""
    import hashlib

    import duckdb

    from go_dfs_mapreduce_spark.operators.llm_extras import (
        WSAMPLE_K,
        corpus_sample_weighted,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    pri = []
    for doc_id, n_chars in docs:
        h = int(hashlib.md5(f"wsamp:{doc_id}".encode()).hexdigest()[:8], 16)
        pri.append((n_chars * 4294967296.0 / (h + 1), doc_id, n_chars))
    pri.sort(key=lambda t: (-t[0], t[1]))
    tau = pri[WSAMPLE_K][0] if len(pri) > WSAMPLE_K else 0.0
    expect = {
        doc_id: (rank + 1, max(float(n_chars), tau))
        for rank, (_, doc_id, n_chars) in enumerate(pri[:WSAMPLE_K])
    }

    got = corpus_sample_weighted(spark, sf_dir).collect()
    assert len(got) == WSAMPLE_K
    for r in got:
        rank, est = expect[r.doc_id]
        assert r.sample_rank == rank
        assert r.est_weight == est  # exact double equality
        assert r.est_weight >= r.weight  # DLT: estimate never below weight


def test_morton_interleave_matches_pure_python():
    """The generated SQL interleave expression computes the textbook
    Morton code (checked on DuckDB against a bit-twiddling reference)."""
    import random

    import duckdb

    from go_dfs_mapreduce_spark.operators.training_prep import (
        ZORDER_BITS,
        _zorder_interleave_duck,
    )

    rng = random.Random(12)
    pairs = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(64)]
    expr = _zorder_interleave_duck("a", "b")
    for a, b in pairs:
        # BIGINT like the real oracle's columns (INTEGER << 31 overflows)
        got = duckdb.sql(
            f"SELECT {expr} FROM (SELECT CAST({a} AS BIGINT) a, CAST({b} AS BIGINT) b)"
        ).fetchone()[0]
        want = sum(
            (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
            for i in range(ZORDER_BITS)
        )
        assert got == want


def test_zorder_layout_audit_invariants(spark, sf_dir):
    """Both layouts hold the same table and match the same rows; the
    z-order layout never scans MORE than linear for the 2-D box (that
    superiority on both dimensions is the operator's whole claim), and
    pruning is sound (scanned rows cover every match)."""
    from go_dfs_mapreduce_spark.operators.training_prep import (
        ZORDER_FILES,
        zorder_layout_audit,
    )

    rows = {r.layout: r for r in zorder_layout_audit(spark, sf_dir).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z.files_total == lin.files_total == ZORDER_FILES
    assert z.rows_total == lin.rows_total
    assert z.rows_matched == lin.rows_matched
    for r in (z, lin):
        assert r.rows_in_scanned_files >= r.rows_matched
        assert r.files_scanned <= r.files_total
    assert z.files_scanned <= lin.files_scanned
    assert z.rows_in_scanned_files <= lin.rows_in_scanned_files


def test_scene_cut_detector_truth_table(spark, sf_dir):
    """The detector recovers the injected ground truth exactly: docs with
    doc_id % 3 != 0 carry one midpoint scene change (cut at frame
    nf // 2), the rest are single-shot negatives with no cut."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_video_scene_cuts,
    )

    for r in multimodal_video_scene_cuts(spark, sf_dir).collect():
        nf = r.doc_id % 5 + 2
        assert r.n_frames == nf
        if r.doc_id % 3:
            assert r.n_cuts == 1
            assert r.first_cut_frame == nf // 2
        else:
            assert r.n_cuts == 0
            assert r.first_cut_frame == -1


def test_avi_mjpeg_roundtrip_exact():
    """The MJPEG-AVI decoder recovers every frame's block-constant luma
    formula bit-exactly on both container arms (with and without idx1),
    and quarantines the every-7th progressive-middle-frame docs."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        AVI_FRAME_SEED_STEP,
        decode_avi_mjpeg,
        make_avi_mjpeg_bytes,
    )

    for doc_id in (1, 2, 9, 12):  # odd/even: no-index and idx1 arms
        w0, h0 = doc_id % 21 + 4, doc_id % 17 + 4
        dec = decode_avi_mjpeg(make_avi_mjpeg_bytes(doc_id))
        assert dec is not None
        w, h, frames = dec
        assert (w, h) == (w0, h0) and len(frames) == doc_id % 4 + 2
        for f, px in enumerate(frames):
            seed = doc_id + AVI_FRAME_SEED_STEP * f
            want = np.fromfunction(
                lambda y, x: (seed + 2 * (x // 8) + 3 * (y // 8)) % 256,
                (h, w),
            )
            assert (np.asarray(px) == want).all(), (doc_id, f)
    for doc_id in (0, 7, 14):
        assert decode_avi_mjpeg(make_avi_mjpeg_bytes(doc_id)) is None


def test_avi_mjpeg_truncation_and_tamper_quarantine():
    """The shared truncation sweep applied to the AVI container: every
    strict prefix -> None; plus the container-specific tamper cases —
    trailing garbage (strict RIFF size), a stale idx1 offset, an
    index/flag mismatch, and an avih/strf dimension disagreement."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_avi_mjpeg,
        make_avi_mjpeg_bytes,
    )

    b = make_avi_mjpeg_bytes(2)  # even: carries idx1
    assert decode_avi_mjpeg(b) is not None
    for i in range(len(b)):
        assert decode_avi_mjpeg(b[:i]) is None, i
    assert decode_avi_mjpeg(b + b"\x00") is None
    # stale index: bump the first idx1 entry's offset
    idx_pos = b.rfind(b"idx1")
    tampered = bytearray(b)
    tampered[idx_pos + 16] ^= 0x01  # entry 0 dwChunkOffset low byte
    assert decode_avi_mjpeg(bytes(tampered)) is None
    # index dropped but AVIF_HASINDEX still set: flag/chunk mismatch
    # (RIFF size re-stated so only the inconsistency is at fault)
    idx_len = 8 + int.from_bytes(b[idx_pos + 4 : idx_pos + 8], "little")
    noidx = bytearray(b[:idx_pos] + b[idx_pos + idx_len :])
    noidx[4:8] = (len(noidx) - 8).to_bytes(4, "little")
    assert decode_avi_mjpeg(bytes(noidx)) is None
    # avih/strf disagreement: bump avih dwWidth only
    avih_pos = b.find(b"avih")
    disagree = bytearray(b)
    disagree[avih_pos + 8 + 32] ^= 0x01
    assert decode_avi_mjpeg(bytes(disagree)) is None


def test_jpeg_metadata_roundtrip_and_quarantine():
    """The metadata walk recovers density/orientation/comment/dims
    exactly in BOTH TIFF endiannesses, the spliced segments leave the
    pixel payload decodable, every truncation quarantines (EOI trailer
    rule), and present-but-corrupt Exif quarantines the whole doc."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        jpeg_metadata,
        make_jpeg_meta_bytes,
    )

    for d in (1, 2, 3, 10, 24, 42):  # even = II, odd = MM
        b = make_jpeg_meta_bytes(d)
        units, xd, yd, o, c, w, h = jpeg_metadata(b)
        assert (units, xd, yd, o) == (d % 3, d % 300 + 1, d % 200 + 1, d % 8 + 1)
        assert c == f"shot {d} lens {(3 * d) % 50}"
        assert (w, h) == (d % 9 + 4, d % 7 + 4)
        assert decode_jpeg_pixels(b) is not None
    assert jpeg_metadata(make_jpeg_meta_bytes(11)) is None  # bad TIFF magic
    b = make_jpeg_meta_bytes(3)
    for i in range(len(b)):
        assert jpeg_metadata(b[:i]) is None, i
    assert jpeg_metadata(b + b"x") is None  # trailing garbage


def test_srt_parse_roundtrip_and_quarantine():
    """The SRT parser recovers every planted cue (timing + multi-line
    text) bit-exactly and quarantines malformed streams — reversed
    timestamps, broken timing arrows, non-sequential indices, trailing
    garbage blocks, non-UTF8 — without raising."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        make_srt_bytes,
        parse_srt,
    )

    for d in (1, 2, 3, 4, 5, 10, 13, 42):
        cues = parse_srt(make_srt_bytes(d))
        if d % 9 == 0:
            assert cues is None
            continue
        assert len(cues) == d % 4 + 2
        phase = 137 * (d % 13)
        for i, (s, e, t) in enumerate(cues):
            assert s == phase + 1700 * i
            assert e == s + 800 + 90 * ((d + i) % 5)
            assert t == f"cue {i} of doc {d}\npace {(7 * d + i) % 100}"
    assert parse_srt(make_srt_bytes(0)) is None  # reversed middle cue
    assert parse_srt(b"") is None
    assert parse_srt(b"\xff\xfe junk") is None
    b = make_srt_bytes(3)
    assert parse_srt(b + b"\n\nnot-a-cue") is None
    assert parse_srt(b.replace(b"-->", b"->")) is None
    assert parse_srt(b.replace(b"1\n00:", b"7\n00:", 1)) is None


def test_video_keyframes_match_scene_truth(spark, sf_dir):
    """The keyframe manifest recovers the injected shot structure: docs
    with doc_id % 3 != 0 yield two shots split at nf // 2, the rest one
    full-length shot; shot lengths partition the frame count."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_video_keyframes,
    )

    rows = multimodal_video_keyframes(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, shots in by_doc.items():
        nf = d % 5 + 2
        shots.sort(key=lambda r: r.shot_idx)
        assert sum(r.n_frames for r in shots) == nf
        if d % 3:
            assert [r.start_frame for r in shots] == [0, nf // 2]
        else:
            assert [r.start_frame for r in shots] == [0]


def test_caption_alignment_pairs_every_frame_once(spark, sf_dir):
    """The cross-modal alignment join pairs EVERY decoded frame with
    exactly one cue — the one covering its midpoint (cue = frame // 2
    under the aligned fixture) — and carries that cue's parsed text."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_caption_alignment,
    )

    rows = multimodal_caption_alignment(spark, sf_dir).collect()
    seen: dict[tuple[int, int], int] = {}
    for r in rows:
        key = (r.doc_id, r.frame_idx)
        assert key not in seen  # exactly one cue per frame
        seen[key] = r.cue_idx
        assert r.cue_idx == r.frame_idx // 2
        assert r.cap_text == f"cap {r.cue_idx} of doc {r.doc_id}"
    docs = {d for d, _ in seen}
    for d in docs:  # no frame dropped by the join
        nf = d % 5 + 2
        assert {(d, f) for f in range(nf)} <= set(seen)


def test_audio_fingerprint_incremental_matches_only_older_partners(spark, sf_dir):
    """Incremental matching returns exactly the planted pairs whose NEW
    side is above the ingest boundary and whose partner is strictly
    older: every odd doc above t matches its even sibling (corpus or
    batch provenance by the sibling's side of t); even docs above t
    have only a NEWER partner and contribute nothing."""
    from pyspark.sql import functions as F

    from go_dfs_mapreduce_spark.operators.multimodal import (
        AFP_SPLIT_DEN,
        AFP_SPLIT_NUM,
        multimodal_audio_fingerprint_incremental,
    )
    from go_dfs_mapreduce_spark.tables import table as _table

    max_id = (
        _table(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0]
    )
    t = max_id * AFP_SPLIT_NUM // AFP_SPLIT_DEN
    rows = multimodal_audio_fingerprint_incremental(spark, sf_dir).collect()
    got = {(r.new_doc, r.matched_doc, r.matched_in) for r in rows}
    want = {
        (d, d - 1, "corpus" if d - 1 <= t else "batch")
        for d in range(t + 1, max_id + 1)
        if d % 2 == 1
    }
    assert got == want
    assert all(r.n_shared >= 9 for r in rows)


def test_audio_fingerprint_matches_exactly_planted_pairs(spark, sf_dir):
    """Landmark matching returns exactly the planted (2b, 2b+1) pairs —
    no cross-base false positives survive the >= 4-shared threshold —
    and every match shares at least the 9-hash construction floor."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_audio_fingerprint_dedup,
    )

    rows = multimodal_audio_fingerprint_dedup(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    n_docs = max(r.doc_b for r in rows) + 1 if rows else 0
    want = {(2 * b, 2 * b + 1) for b in range((n_docs + 1) // 2)}
    assert got == want
    assert all(r.n_shared >= 9 for r in rows)


def test_audio_landmark_hashes_shift_invariant():
    """The hash extractor itself is time-shift invariant: any signal
    prepended with sub-threshold padding yields identical hashes."""
    import numpy as np

    from go_dfs_mapreduce_spark.operators.multimodal import (
        audio_landmark_hashes,
    )

    rng_signal = np.zeros(300, dtype=np.int64)
    for p, a in ((7, 1200), (19, 1500), (30, 1000), (44, 1900), (61, 1100)):
        rng_signal[p] = a
    base = audio_landmark_hashes(rng_signal)
    assert len(base) == 2  # 5 peaks -> 4 gaps -> 2 gap 3-grams
    shifted = np.concatenate([np.full(37, 50, dtype=np.int64), rng_signal])
    assert audio_landmark_hashes(shifted) == base
    # fewer than 4 peaks -> no hashes, never an error
    assert audio_landmark_hashes(rng_signal[:20]) == []


def test_video_frame_dedup_reunites_planted_variants(spark, sf_dir):
    """Cross-video frame dedup on decoded pixels: the three byte-
    different variants of each complete base share all four frame
    fingerprints (n_dup_frames = 3, canonical = the base's smallest
    doc), and no fingerprint ever spans two bases."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        VFRAME_VARIANTS,
        multimodal_video_frame_dedup,
    )

    rows = multimodal_video_frame_dedup(spark, sf_dir).collect()
    docs_by_base: dict[int, set] = {}
    for r in rows:
        docs_by_base.setdefault(r.doc_id // VFRAME_VARIANTS, set()).add(
            r.doc_id
        )
    by_fp: dict[str, list] = {}
    for r in rows:
        by_fp.setdefault(r.fingerprint, []).append(r)
    for members in by_fp.values():
        bases = {m.doc_id // VFRAME_VARIANTS for m in members}
        assert len(bases) == 1, bases  # no cross-base merges
        base = bases.pop()
        # every doc of the base contributes the content exactly once
        assert sorted(m.doc_id for m in members) == sorted(
            docs_by_base[base]
        )
        lo = min(docs_by_base[base])
        for m in members:
            assert m.n_dup_frames == len(docs_by_base[base])
            assert m.canonical_doc == lo


def test_stratified_priority_sampling_matches_pure_python_replay(spark, sf_dir):
    """Differential: the per-language priority sample equals a pure-Python
    replay — per-stratum ranks, per-stratum tau (0.0 for strata smaller
    than k+1), bit-identical est_weight doubles."""
    import hashlib

    import duckdb

    from go_dfs_mapreduce_spark.operators.llm_extras import (
        WSAMPLE_PER_LANG,
        corpus_sample_weighted_stratified,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_lang = {}
    for doc_id, lang, n_chars in docs:
        h = int(hashlib.md5(f"wstrat:{doc_id}".encode()).hexdigest()[:8], 16)
        by_lang.setdefault(lang, []).append(
            (n_chars * 4294967296.0 / (h + 1), doc_id, n_chars)
        )
    expect = {}
    for lang, pri in by_lang.items():
        pri.sort(key=lambda t: (-t[0], t[1]))
        tau = pri[WSAMPLE_PER_LANG][0] if len(pri) > WSAMPLE_PER_LANG else 0.0
        for rank, (_, doc_id, n_chars) in enumerate(pri[:WSAMPLE_PER_LANG]):
            expect[doc_id] = (lang, rank + 1, max(float(n_chars), tau))

    got = corpus_sample_weighted_stratified(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        lang, rank, est = expect[r.doc_id]
        assert (r.lang, r.rank_in_lang, r.est_weight) == (lang, rank, est)


def test_html_escape_roundtrip_adversarial(spark):
    """The fixture corpus has no &<> characters, so the gate's md5 proof
    cannot catch a broken escape path — this test feeds the SAME escape/
    extract/unescape expressions adversarial bodies: literal entities
    ('&lt;'), real tags ('</div>', '<p>'), ampersand runs, and the
    closing sequence of the main div itself."""
    from go_dfs_mapreduce_spark.operators.corpus_ops import (
        html_escape_expr,
        html_unescape_expr,
    )

    bodies = [
        "plain text",
        "literal entity &lt; stays literal",
        "a < b > c & d &&& <p>tag</p>",
        "breakout attempt </p></div><footer>",
        "&amp;lt; double-escaped",
        "",
    ]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bodies)], ["i", "text"])
    esc = html_escape_expr("text")
    page = df.selectExpr(
        "i",
        "text",
        f"concat('<nav><p>Home</p></nav><div class=\"main\"><p>', {esc},"
        " '</p></div><footer><a href=\"x\">more</a></footer>') AS html",
    )
    body = (
        'regexp_extract(html, \'(?s)<div class="main"><p>(.*?)</p></div>\', 1)'
    )
    got = page.selectExpr(
        "i", "text", f"{html_unescape_expr(body)} AS recovered"
    ).collect()
    for r in got:
        assert r.recovered == r.text, (r.text, r.recovered)


def test_bloom_skipping_audit_invariants(spark, sf_dir):
    """Bloom soundness and the point-lookup story: a Bloom filter never
    misses a containing file (n_bloom >= n_actual — no false negatives,
    by construction), and in a date-sorted layout every probe passes the
    min/max check in far more files than the Bloom admits."""
    from go_dfs_mapreduce_spark.operators.training_prep import (
        BLOOM_FILES,
        bloom_skipping_audit,
    )

    rows = bloom_skipping_audit(spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.n_files_bloom >= r.n_files_actual  # no false negatives
        assert r.n_files_minmax <= BLOOM_FILES
        assert r.n_files_bloom <= r.n_files_minmax
    total_bloom = sum(r.n_files_bloom for r in rows)
    total_minmax = sum(r.n_files_minmax for r in rows)
    assert total_bloom * 3 < total_minmax  # the audit's whole point


def test_gif_animation_quarantine_cases():
    """Out-of-scope and malformed animations route to None: transparency
    flag, disposal methods 2/3, a sub-rectangle outside the canvas,
    trailing garbage after the trailer."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        decode_gif_frames,
        make_gif_anim_bytes,
    )

    good = bytearray(make_gif_anim_bytes(7))
    assert decode_gif_frames(bytes(good)) is not None
    gce = good.index(bytes((0x21, 0xF9, 0x04)))
    transparent = bytearray(good)
    transparent[gce + 3] |= 0x01
    assert decode_gif_frames(bytes(transparent)) is None
    disposal2 = bytearray(good)
    disposal2[gce + 3] = 0x08  # disposal method 2 (restore background)
    assert decode_gif_frames(bytes(disposal2)) is None
    desc = good.index(0x2C, gce)
    oob = bytearray(good)
    oob[desc + 5 : desc + 7] = (5000).to_bytes(2, "little")  # fw > canvas
    assert decode_gif_frames(bytes(oob)) is None
    assert decode_gif_frames(bytes(good) + b"x") is None
    assert decode_gif_frames(b"GIF89a") is None


def test_audio_vad_truth_table(spark, sf_dir):
    """The VAD recovers the injected ground truth exactly: block j is
    active iff j % 2 == doc_id % 2, so exactly ceil/floor-half of the
    blocks are active and the first active block is 0 or 1."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_audio_vad,
    )

    for r in multimodal_audio_vad(spark, sf_dir).collect():
        nb = r.doc_id % 5 + 2
        assert r.n_blocks == nb
        want_active = [j for j in range(nb) if j % 2 == r.doc_id % 2]
        assert r.n_active_blocks == len(want_active)
        assert r.first_active_block == want_active[0]


def test_image_phash_dedup_group_structure(spark, sf_dir):
    """Perceptual-hash grouping invariants: the five byte-different docs
    of each planted base ALWAYS share one hash (off-grid noise never
    splits a group, so every group size is a multiple of five),
    brightness-shift-only bases may legally merge (aHash is
    shift-invariant), and the canonical is the group's min doc_id."""
    from go_dfs_mapreduce_spark.operators.multimodal import (
        multimodal_image_phash_dedup,
    )

    rows = multimodal_image_phash_dedup(spark, sf_dir).collect()
    corpus_by_base: dict[int, set] = {}
    for r in rows:
        corpus_by_base.setdefault(r.doc_id // 5, set()).add(r.doc_id)
    by_hash: dict[tuple[int, int], list] = {}
    for r in rows:
        by_hash.setdefault((r.phash_hi, r.phash_lo), []).append(r)
    for members in by_hash.values():
        docs = sorted(m.doc_id for m in members)
        assert len(docs) % 5 == 0 and len(docs) >= 5
        for b in {d // 5 for d in docs}:
            # a base's five docs never split across groups: every doc of
            # base b present ANYWHERE in the corpus is in this group
            assert corpus_by_base[b] <= set(docs), (b, docs)
        for m in members:
            assert m.group_size == len(docs)
            assert m.canonical_doc == docs[0]
    # every planted five-doc base is intact in exactly one group
    all_docs = sorted(r.doc_id for r in rows)
    for b in {d // 5 for d in all_docs}:
        expect = [d for d in all_docs if d // 5 == b]
        keys = {
            (r.phash_hi, r.phash_lo) for r in rows if r.doc_id // 5 == b
        }
        assert len(keys) == 1, (b, expect)


def test_recursive_balance_kstep_matches_python_fold(spark):
    """r16: the recursion advances _REC_K positions per UnionLoop level
    (lead-column fold). Chain lengths straddling every block boundary
    (1, K-1, K, K+1, 2K, 2K+1) must reproduce the straight sequential
    integer fold bal = floor(bal*101/100) + cents exactly — n_orders is
    the true chain length even when the final block is short, and the
    final balance composes the identical floor steps in order."""
    import datetime

    from go_dfs_mapreduce_spark.operators.timeseries import (
        _REC_K,
        _compound_balance_from_orders,
    )

    K = _REC_K
    lengths = {1: 1, 2: K - 1, 3: K, 4: K + 1, 5: 2 * K, 6: 2 * K + 1}
    rows = []
    for cust, n in lengths.items():
        for i in range(n):
            # distinct per-position prices; date order defines seq
            rows.append(
                (
                    cust,
                    cust * 1000 + i,
                    datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
                    float(100 + 7 * cust + 13 * i) + 0.25,
                )
            )
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate date, o_totalprice double"
    )
    got = {
        r.o_custkey: (r.n_orders, r.final_balance_cents)
        for r in _compound_balance_from_orders(spark, orders).collect()
    }

    for cust, n in lengths.items():
        cents = [
            round((100 + 7 * cust + 13 * i + 0.25) * 100) for i in range(n)
        ]
        bal = cents[0]
        for c in cents[1:]:
            bal = (bal * 101) // 100 + c
        assert got[cust] == (n, bal), (cust, n)
