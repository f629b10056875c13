"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.13).

Five tiers, cheapest-first — the order you'd run them at 100 TB:

1. exact        — hash groupBy on normalized text (one shuffle).
2. fingerprint  — xxhash64 of normalized text; same cost, joinable artifact.
3. minhash LSH  — shingle → K minhashes → B bands → bucket self-join.
4. simhash      — 64-bit weighted token hash; near-dups differ in few bits.
5. ngram-jaccard / embedding-cosine — exact verify inside candidate buckets.

Scale design notes (apply to all):
* Candidate generation NEVER compares all pairs — banding/bucketing bounds
  the self-join to rows sharing a bucket key.
* Boilerplate skew: a bucket shared by B docs is row-wise quadratic
  (B²/2 pairs), and — measured, see
  tests/test_extensions.py::test_minhash_banded_join_under_planted_skew —
  AQE's byte-based skew detection under-fires on exactly those buckets
  because their identical keys compress to almost nothing in the map
  outputs; nor can a shuffle split shrink the O(B²) output. The
  ``max_bucket_size`` cap on ``minhash_lsh_candidates`` is therefore the
  primary guard (row-count, not bytes); AQE skew-split remains the
  runtime net for byte-visible skew elsewhere in the plan.
* All hashing is JVM-side (`xxhash64`) inside codegen; no Python.
* Outputs are (doc_id, group/pair) relations, not materialized texts —
  at 100 TB you join the verdicts back, you don't carry the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    MINHASH_P,
    md5_hash60,
    minhash_coefficients,
    minhash_value,
)
from ..functions.text import char_ngrams, rolling_fingerprint, shingles, tokens


def _shingle_expr(text_col: str, shingle_n: int, basis: str) -> Column:
    """Shingle basis: ``word`` n-grams for space-delimited languages;
    ``char`` n-grams for CJK / mixed corpora where word tokenization
    degenerates (a Chinese sentence is one giant \\p{L} token)."""
    if basis == "char":
        return F.array_distinct(char_ngrams(F.col(text_col), shingle_n))
    return F.array_distinct(shingles(tokens(F.col(text_col)), shingle_n))


def _norm_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(text, r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the min-id representative per normalized text.

    groupBy on the text hash (not the text) keeps shuffle keys at 16 bytes
    instead of document-sized."""
    key = F.md5(_norm_text(F.col(text_col))).alias("_k")
    return (
        df.select(key, F.col(id_col))
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_k")
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      hash_fn: str = "xxhash64") -> DataFrame:
    """Document-fingerprint dedup: 64-bit fingerprint per doc, min-id
    representative per fingerprint. ``hash_fn="md5"`` swaps the xxhash64
    fingerprint for the cross-engine `md5_hash60` of the same normalized
    text, so the exact fingerprint VALUES (not just the grouping) have a
    DuckDB oracle."""
    fp = (
        md5_hash60(_norm_text(F.col(text_col)))
        if hash_fn == "md5"
        else rolling_fingerprint(F.col(text_col))
    )
    return (
        df.select(
            fp.alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    basis: str = "word",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """K minhash values per doc: min over shingles of hash_i(shingle).

    ``hash_fn="xxhash64"`` (production): xxhash64(shingle, seed_i) — fast,
    JVM-internal. ``hash_fn="md5"`` (verification): the cross-engine
    universal-hash family over `md5_hash60` (functions/hashing.py), which
    a DuckDB oracle replays bit-identically — same shingles, same K mins.

    Shape: explode shingles → K hash columns → groupBy(id).agg(K mins).
    A doc's shingles are co-located in its input partition, so map-side
    partial aggregation collapses to one row per doc BEFORE the shuffle —
    shuffle volume is docs × K longs (~256 B/doc at K=32), independent of
    document length. Measured ~1.7× faster than the no-shuffle
    K×array_min(transform(...)) formulation, which allocates K intermediate
    arrays per document inside one giant codegen expression."""
    from ..functions.partitioning import ensure_scan_parallelism

    sh = _shingle_expr(text_col, shingle_n, basis)
    # single-row-group inputs scan as ONE task; the shingle+hash work is
    # fused into that scan, so spread it first (no-op on split inputs)
    exploded = ensure_scan_parallelism(df).select(
        F.col(id_col), F.explode(sh).alias("_s")
    )
    if hash_fn == "md5":
        base = md5_hash60(F.col("_s")) % F.lit(MINHASH_P)
        exploded = exploded.select(F.col(id_col), base.alias("_x"))
        mins = [
            F.min(minhash_value(F.col("_x"), a, b))
            for a, b in minhash_coefficients(num_hashes)
        ]
    else:
        mins = [F.min(F.xxhash64("_s", F.lit(i))) for i in range(num_hashes)]
    return exploded.groupBy(id_col).agg(F.array(*mins).alias("signature"))


def _band_signatures(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int,
    exact_keys: bool = False,
) -> DataFrame:
    """(id, band_id, band_hash) rows: one xxhash64 per band over its
    signature slice. ``exact_keys=True`` keeps the slice itself (a
    comma-joined string) as the bucket key instead of hashing it —
    collision-free, so the candidate set is a pure function of signature
    values and a DuckDB oracle reproduces it exactly (the verification
    configuration; the 8-byte hashed key is the production default
    because it shuffles less)."""
    def band_key(b: int):
        joined = F.concat_ws(
            ",",
            *[
                F.col("signature")[b * rows_per_band + r]
                for r in range(rows_per_band)
            ],
        )
        return joined if exact_keys else F.xxhash64(joined)

    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[band_key(b) for b in range(bands)])
        ).alias("band_id", "band_hash"),
    )


def relative_cap(n_rows: int, floor: int = 64, denom: int = 10_000) -> int:
    """Corpus-relative skew-cap default: ``max(floor, n_rows // denom)``.

    Round-7 close of the sf-tuned-constants caveat: an ABSOLUTE bucket/
    block cap tuned at one scale silently changes which candidates exist
    at another (too tight at 100 TB drops real near-dup clusters; too
    loose at sf0.01 lets boilerplate go quadratic). Expressed relative to
    corpus size, the cap keeps the same MEANING across decades: a bucket
    is "boilerplate-skewed" when it holds more than ~0.01% of the corpus
    (never fewer than ``floor`` members, so small corpora are never
    capped). Pass the result anywhere a ``max_bucket_size`` /
    ``max_block_size`` parameter is taken, or pass the string ``"auto"``
    to those operators to have them derive it from a one-scalar count of
    their own input (a documented bounded driver action — same class as
    the connected-components convergence scalar)."""
    return max(floor, n_rows // denom)


def _resolve_cap(
    cap: int | str | None, df: DataFrame, id_col: str
) -> int | None:
    """Resolve a cap parameter: int → itself, "auto" → relative_cap of
    the distinct-id count of ``df``, None → no cap."""
    if cap is None or isinstance(cap, int):
        return cap
    if cap == "auto":
        n = df.select(id_col).distinct().count()
        return relative_cap(n)
    raise ValueError(f"cap must be int, None or 'auto', got {cap!r}")


def _cap_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop band buckets with more than ``max_bucket_size`` members (the
    boilerplate-skew guard — see module docstring)."""
    ok = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bucket_n"))
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
    )
    return banded.join(ok, ["band_id", "band_hash"], "inner")


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket_size: int | str | None = None,
    exact_keys: bool = False,
) -> DataFrame:
    """Band the signatures and self-join on (band_id, band_hash) to emit
    candidate pairs (a < b). Only rows sharing a band bucket are compared —
    the candidate set is linear-ish in data size, never O(n²).

    ``max_bucket_size`` is the boilerplate-skew guard: a band bucket shared
    by B docs emits B² /2 pairs, so one boilerplate sentence stamped into
    20% of a corpus turns the self-join quadratic no matter how the
    partitions are split (AQE skew-split rebalances the shuffle but cannot
    shrink the pair count). Buckets above the cap are excluded from
    candidate generation: their members are either exact/near-exact dups
    (already collapsed by the cheaper exact/fingerprint tiers that run
    first at 100 TB) or share only ubiquitous boilerplate (not meaningful
    near-dup evidence). The cap is computed with one extra aggregation on
    the bucket key — no window, no second shuffle of the full banded set.
    ``"auto"`` derives the cap from corpus size via :func:`relative_cap`
    (scale-invariant meaning across data decades)."""
    max_bucket_size = _resolve_cap(max_bucket_size, sigs, id_col)
    banded = _band_signatures(sigs, id_col, bands, rows_per_band, exact_keys)
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    basis: str = "word",
    max_bucket_size: int | str | None = None,
    hash_fn: str = "xxhash64",
    round_digits: int | None = 6,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → banded candidates →
    exact n-gram Jaccard verify on the candidates only. ``basis="char"``
    switches the shingle alphabet for CJK/mixed corpora (use shingle_n≈5);
    ``max_bucket_size`` caps boilerplate-skewed band buckets (see
    ``minhash_lsh_candidates``). ``hash_fn="md5"`` switches the whole
    path onto the cross-engine hash (functions/hashing.py) with exact
    (unhashed) band-bucket keys — deterministic across engines, so a
    DuckDB oracle replays signatures AND candidates AND verify."""
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, basis, hash_fn
    )
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, max_bucket_size,
        exact_keys=(hash_fn == "md5"),
    )
    return ngram_jaccard_verify(
        cands, df, text_col, id_col, shingle_n, jaccard_threshold, basis,
        round_digits,
    )


def minhash_incremental_pairs(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    basis: str = "word",
    max_bucket_size: int | str | None = None,
    hash_fn: str = "xxhash64",
    round_digits: int | None = 6,
) -> DataFrame:
    """Incremental near-dup detection: a NEW batch against an EXISTING
    corpus — the shape a production pipeline actually runs daily. The
    corpus side is its persisted signature table (``corpus_sigs``, the
    artifact ``minhash_signatures`` writes once per corpus build); only
    the new batch is shingled and hashed. Candidates come from a banded
    new×corpus equi-join — cost scales with |new| × bucket density, NOT
    |corpus|², and the corpus text is only touched for the candidate ids
    in the verify step (``docs`` must cover both sides' ids).

    Output: (id_a=new doc, id_b=corpus doc, jaccard) for verified pairs.
    New-batch-internal duplicates are the ordinary self-join
    (``minhash_dedup_pairs`` on the batch); run both for a full daily
    merge.

    ``hash_fn="md5"`` is the cross-engine verification mode (see
    ``minhash_dedup_pairs``) — ``corpus_sigs`` must then have been built
    with the same mode."""
    exact = hash_fn == "md5"
    new_sigs = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n, basis, hash_fn
    )
    rows_per_band = num_hashes // bands
    banded_new = _band_signatures(new_sigs, id_col, bands, rows_per_band, exact)
    max_bucket_size = _resolve_cap(max_bucket_size, corpus_sigs, id_col)
    banded_corpus = _band_signatures(corpus_sigs, id_col, bands, rows_per_band, exact)
    if max_bucket_size is not None:
        banded_corpus = _cap_buckets(banded_corpus, max_bucket_size)
    cands = (
        banded_new.alias("a")
        .join(
            banded_corpus.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return ngram_jaccard_verify(
        cands, docs, text_col, id_col, shingle_n, jaccard_threshold, basis,
        round_digits,
    )


def ngram_jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
    basis: str = "word",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (id_a, id_b).
    ``round_digits=None`` emits the raw IEEE ratio (size/size is the same
    int->double division in any engine - exactly oracle-comparable).

    Set ops run on arrays JVM-side; the docs table is joined twice by id —
    at scale these are shuffle-hash joins on the id, and `pairs` is tiny
    relative to the corpus because LSH already pruned."""
    from ..functions.partitioning import ensure_scan_parallelism

    sh = _shingle_expr(text_col, shingle_n, basis)
    # the per-doc shingle arrays are computed in the docs scan stage —
    # spread an unsplittable scan before it (no-op on split inputs)
    d = ensure_scan_parallelism(docs).select(F.col(id_col), sh.alias("_sh"))
    out = (
        pairs.join(d.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sa"), "id_a")
        .join(d.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "id_a", "id_b",
            (F.round("jaccard", round_digits) if round_digits is not None
             else F.col("jaccard")).alias("jaccard"),
        )
    )
    return out


def dedup_groups(
    pairs: DataFrame,
    max_iterations: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, group_id) with
    group_id = smallest doc id in the component. THE missing last step
    between "pairs were found" and "which docs to drop": keep
    group_id == doc_id, drop the rest.

    Two algorithms behind one contract:

    * ``label`` — iterative min-label propagation: every node adopts the
      smallest label among itself and its neighbors until a fixpoint (one
      shuffle per sweep; O(diameter) sweeps — near-dup components are
      shallow, so typically 2-4). The fastest choice for the common case.
    * ``star`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond"): each round halves
      component depth, converging in O(log n) rounds regardless of
      diameter — the choice for adversarial chain-shaped graphs
      (see ``test_dedup_groups_long_chain``).

    The loop is driver-coordinated but all data movement is
    joins/aggregations — no collect(); convergence checks are 1-row
    aggregates. Every per-sweep frame is ``localCheckpoint``-ed so plan
    lineage stays O(1) in the iteration count instead of accreting the
    whole loop history (without it, sweep N's plan contains N copies of
    the upstream pair-generation pipeline)."""
    if algorithm == "star":
        return _dedup_groups_star(pairs, max_iterations)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}; use 'label' or 'star'")
    # Cache the symmetrized edge list: every propagation sweep joins
    # against it, and without the cache each sweep re-executes the ENTIRE
    # upstream pair-generation pipeline (e.g. the full MinHash banding) —
    # measured 3x slower. Edges are (id, id) pairs, tiny relative to the
    # corpus; the cache stays for downstream actions on the result.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .cache()
    )
    # Initialize each node's label to min(node, min(neighbors)) — exactly
    # what the first propagation sweep would compute from identity labels,
    # but folded into the node-list aggregation: saves one full
    # join+groupBy sweep (shallow components then converge in 1-2 sweeps
    # instead of 2-3).
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.least(F.first("src"), F.min("dst")).alias("label")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # localCheckpoint (eager) materializes the sweep AND truncates
        # lineage — each sweep's plan starts from stored blocks, not from
        # a re-derivation of every earlier sweep.
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("_old"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("label") != F.col("_old")).limit(1).count()
        labels = updated.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("group_id"))


def _dedup_groups_star(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Large-star/small-star connected components (O(log n) rounds).

    Round = large-star (hang every node's larger neighbors off the local
    minimum) then small-star (re-hang smaller neighbors and self off the
    minimum). At the fixpoint the edge set is a forest of depth-1 stars
    rooted at each component's minimum id. Convergence is detected by an
    order-insensitive edge checksum (count + bit_xor of xxhash64; XOR
    never overflows under ANSI mode) — two identical consecutive edge
    sets mean fixpoint."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # All nodes, for singleton-free label emission at the end (every input
    # node has at least one edge by construction of `pairs`).
    prev_sig = None
    for _ in range(max_iterations):
        # Large-star: sym edges, m(u) = min(N(u) ∪ {u}), emit (v, m) for v > u.
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # Small-star on larger→smaller edges: m(u) = min(N(u)),
        # emit (v, m) for v ∈ N(u) \ {m} plus (u, m).
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig_row = small.agg(
            F.count(F.lit(1)).alias("c"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).first()
        sig = (sig_row["c"], sig_row["h"])
        edges = small
        if sig == prev_sig:
            break
        prev_sig = sig
    roots = edges.select(F.col("v").alias("node")).subtract(
        edges.select(F.col("u").alias("node"))
    )
    return (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("group_id"))
        .unionByName(
            roots.select(F.col("node").alias("doc_id"), F.col("node").alias("group_id"))
        )
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per document (60-bit in ``hash_fn="md5"`` mode).

    Each token hashes to 64 bits; each bit votes +1/-1 weighted by token
    frequency; the sign vector is the fingerprint. Near-identical docs
    differ in a handful of bits (compare with `bit_count(a ^ b)`).

    ``hash_fn="md5"`` uses the cross-engine `md5_hash60` token hash — 60
    vote bits instead of 64 (the fingerprint stays a positive BIGINT in
    every engine), and a DuckDB oracle reproduces the fingerprint
    bit-for-bit. Production default stays xxhash64/64-bit.

    Implemented as explode → branch-free per-bit ones-counts + row count →
    re-assemble (bit i is set iff 2·Σbit_i > n, identical to the ±1 vote
    sign but without 64 when/otherwise branches per row — measured ~30%
    faster). One shuffle on doc_id — no Python, no O(64) joins."""
    from ..functions.partitioning import ensure_scan_parallelism

    width = 60 if hash_fn == "md5" else 64
    tok = ensure_scan_parallelism(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    h = md5_hash60(F.col("_t")) if hash_fn == "md5" else F.xxhash64("_t")
    hashed = tok.select(id_col, h.alias("_h"))
    bit_ones = [
        F.sum(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1))).alias(f"_b{i}")
        for i in range(width)
    ]
    votes = hashed.groupBy(id_col).agg(*bit_ones, F.count(F.lit(1)).alias("_n"))
    sim = F.lit(0).cast("long")
    for i in range(width):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"_b{i}") * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(0)
        )
    return votes.select(F.col(id_col), sim.alias("simhash"))


def simhash_candidates(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, blocks: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Near-dup candidates from simhash via block-permuted exact match: split
    the ``bits``-wide hash into `blocks` chunks; any pair within `max_hamming <
    blocks` bits shares at least one identical chunk (pigeonhole), so a
    self-join per chunk finds all of them without O(n²). ``bits=60`` for
    fingerprints from the md5 verification mode."""
    width = bits // blocks
    chunked = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for b in range(blocks)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def select_canonical(
    df: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Pick ONE surviving document per duplicate component.

    ``quality_col=None``: min-id representative — a pure filter
    (group_id == id or ungrouped), zero additional shuffle; the default
    inside `curate_corpus`.

    ``quality_col='quality_score'``: keep the highest-quality member
    (ties → smallest id) — the curation-grade policy: near-dup clusters
    often pair a clean original with boilerplate-wrapped copies, and
    min-id keeps whichever crawled first, not whichever is cleanest.

    Scale shape: the argmax never shuffles document payloads. Only the
    (id, group, quality) triple goes through the per-group window, and
    winners semi-join back to the full rows on ``id_col`` — at 100 TB the
    wide text/binary columns stay in place while kilobyte-scale keys
    travel."""
    from pyspark.sql import Window

    joined = df.join(groups, id_col, "left")
    if quality_col is None:
        return joined.filter(
            F.col("group_id").isNull() | (F.col("group_id") == F.col(id_col))
        ).drop("group_id")
    gid = F.coalesce(F.col("group_id"), F.col(id_col))
    triple = joined.select(
        F.col(id_col), gid.alias("_gid"), F.col(quality_col).alias("_q")
    )
    w = Window.partitionBy("_gid").orderBy(
        F.col("_q").desc(), F.col(id_col).asc()
    )
    winners = (
        triple.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    left_id: str = "id_a",
    right_id: str = "id_b",
    max_dist: int = 1,
    end_len: int = 8,
    max_block_size: int | str | None = None,
) -> DataFrame:
    """Blocked fuzzy entity-resolution join: pairs of (left, right) rows
    whose ``key_col`` strings are within Levenshtein distance
    ``max_dist``, WITHOUT an all-pairs comparison.

    ``max_block_size`` is the boilerplate-skew guard (same row-count cap
    as ``minhash_lsh_candidates``): a block shared by B keys yields
    O(B^2) candidates, and byte-based AQE skew splitting can't see it
    (identical keys compress away in map outputs) nor shrink the
    quadratic output. Capped blocks are DROPPED — recall for keys whose
    both end-blocks are mega-blocks is sacrificed explicitly, the same
    trade every production ER blocker makes. None (default) keeps the
    provable-completeness contract for the differential oracle.

    Blocking is the two-ended pigeonhole: each key emits a prefix block
    (first ``end_len`` chars) and a suffix block (last ``end_len`` chars,
    counted from the END so insertions/deletions elsewhere don't shift
    it). A single edit occupies one position, so for ``max_dist=1`` and
    keys longer than ``2*end_len`` it cannot disturb both ends — every
    true pair shares at least one block key, i.e. the blocking is
    provably COMPLETE (the driver oracle checks this differentially
    against an unblocked quadratic join). Keys of length <= 2*end_len
    are rejected loudly rather than silently under-recalled.

    Verification uses Spark's bounded ``levenshtein(l, r, threshold)``
    (O(max_dist * n) banded DP, not O(n^2)) inside codegen.

    Scale shape: candidates are rows sharing an ``end_len``-char block
    key — a hash join on short keys; pair dedup shuffles only
    (id, id, key, key) tuples; nothing quadratic in the corpus. For
    ``max_dist > 1`` two end blocks no longer pigeonhole; this operator
    enforces ``max_dist == 1`` (higher radii belong to the MinHash tier
    above)."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_pairs blocking is complete only for max_dist=1; "
            "use the MinHash/SimHash tiers for larger radii"
        )

    def _blocked(df: DataFrame, id_col: str, alias: str) -> DataFrame:
        # loud contract, enforced lazily JVM-side (no extra driver job):
        # silent under-recall on short keys is worse than an error
        key = F.when(
            F.length(key_col) <= 2 * end_len,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fuzzy_pairs requires len({key_col}) > {2 * end_len}"
                        " (two-ended blocking is incomplete for shorter"
                        " keys); filter or pad short keys first: "
                    ),
                    F.col(key_col),
                )
            ),
        ).otherwise(F.col(key_col))
        blocks = F.array(
            F.struct(F.lit("P").alias("side"),
                     F.substring(key, 1, end_len).alias("blk")),
            F.struct(F.lit("S").alias("side"),
                     F.substring(key, -end_len, end_len).alias("blk")),
        )
        return df.select(
            F.col(id_col), key.alias(f"_k_{alias}"),
            F.explode(blocks).alias("_b"),
        ).select(
            id_col, f"_k_{alias}",
            F.col("_b.side").alias("_side"), F.col("_b.blk").alias("_blk"),
        )

    bl = _blocked(left.select(F.col(left_id), key_col), left_id, "a")
    br = _blocked(right.select(F.col(right_id), key_col), right_id, "b")
    # The cap resolves PER SIDE ("auto" → each side's own corpus size):
    # a block's candidate fan-out is |left block| × |right block|, so
    # both factors need their own bound — a cap derived from a small
    # left corpus would spuriously drop right-side blocks on an
    # asymmetric join, and gating only the left would leave the right
    # factor unbounded.
    cap_l = _resolve_cap(max_block_size, left, left_id)
    cap_r = _resolve_cap(max_block_size, right, right_id)

    def _block_capped(b: DataFrame, cap: int) -> DataFrame:
        ok = (
            b.groupBy("_side", "_blk")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= cap)
            .drop("_bn")
        )
        return b.join(ok, ["_side", "_blk"], "inner")

    if cap_l is not None:
        bl = _block_capped(bl, cap_l)
    if cap_r is not None:
        br = _block_capped(br, cap_r)
    cand = (
        bl.join(br, ["_side", "_blk"])
        .select(left_id, right_id, "_k_a", "_k_b")
        .dropDuplicates([left_id, right_id])
    )
    dist = F.levenshtein(F.col("_k_a"), F.col("_k_b"), max_dist)
    return (
        cand.withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select(left_id, right_id, "edit_distance")
    )


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-n-gram spans — the exact-substring
    duplication signal (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): for every document, the maximal runs of
    consecutive token positions whose ``ngram_n``-grams each appear in at
    least ``min_docs`` distinct documents. Downstream curation either
    drops the spans or down-weights the docs.

    Output: (doc_id, span_start, span_end, n_dup_grams) — gram-position
    indices (0-based), all exact integers.

    Scale shape: positions come from ONE posexplode of the ordered
    shingle array; only (doc_id, pos, hash64) triples shuffle — grams
    travel as 8-byte `md5_hash60` keys, never as text. The ubiquity
    count is a combinable count-distinct per gram hash; qualifying grams
    semi-join back; the span merge is the classic islands trick (pos -
    row_number per doc) — one window pass on the doc key, no
    self-joins, nothing quadratic. Cross-engine exact by construction
    (integer positions + md5 hash), hence oracle-backed."""
    from pyspark.sql import Window

    from ..functions.partitioning import ensure_scan_parallelism

    sh = shingles(tokens(F.col(text_col)), ngram_n)
    pos = ensure_scan_parallelism(df).select(
        F.col(id_col), F.posexplode(sh).alias("pos", "_g")
    )
    hashed = pos.select(F.col(id_col), "pos", md5_hash60(F.col("_g")).alias("_h"))
    ubiquitous = (
        hashed.groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    dup = hashed.join(ubiquitous, "_h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn(
        "_grp", F.col("pos") - F.row_number().over(w)
    )
    return islands.groupBy(F.col(id_col), F.col("_grp")).agg(
        F.min("pos").alias("span_start"),
        F.max("pos").alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    ).drop("_grp")


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.9,
    max_gram_df: int | str = 50,
    basis: str = "word",
) -> DataFrame:
    """ASYMMETRIC near-dup detection: overlap coefficient
    ``|A ∩ B| / min(|A|, |B|)`` over n-gram shingle sets — the measure
    that catches a document CONTAINED in another (quotes, excerpts,
    truncated re-crawls, chapter-in-book). Jaccard misses exactly these:
    a 20-line excerpt of a 2000-line page has Jaccard ~0.01 but
    containment 1.0, and excerpt-duplication is endemic in web corpora.

    Output: (id_a, id_b, n_a, n_b, containment) for pairs with
    containment >= threshold, id_a < id_b, containment rounded to 6.

    Scale shape — posting-list blocking, the same discipline as the
    MinHash band join (never all-pairs): each doc's distinct grams
    explode to (md5(gram), id) postings — 16-byte shuffle keys, gram
    text never shuffles — grams shared by > ``max_gram_df`` docs are
    dropped BEFORE the self-join (boilerplate/stopword grams are the
    quadratic blowup; a contained pair shares many grams, so losing its
    most common ones still leaves rare grams to block on), and the
    per-gram self-join emits candidate id pairs that are then verified
    ONCE per distinct pair with two id-keyed joins back to the shingle
    sets. Set intersection runs JVM-side on arrays."""
    from ..functions.partitioning import ensure_scan_parallelism

    max_gram_df = _resolve_cap(max_gram_df, docs, id_col)
    sh = _shingle_expr(text_col, shingle_n, basis)
    sized = (
        ensure_scan_parallelism(docs)
        .select(F.col(id_col).alias("_id"), sh.alias("_sh"))
        .withColumn("_n", F.size("_sh"))
        .filter(F.col("_n") > 0)
    )
    posting = sized.select(
        F.col("_id"), F.explode("_sh").alias("_g")
    ).withColumn("_g", F.md5("_g"))
    eligible = (
        posting.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_gram_df))
        .select("_g")
    )
    p = posting.join(eligible, "_g")
    # Round-7 PPJoin-style EXACT prefilter (output provably unchanged):
    # counting shared ELIGIBLE grams per pair is an int-only aggregation
    # of the posting self-join — no shingle arrays move. The grams the
    # df-cap hid from candidate generation can add at most
    # min(capped_a, capped_b) to the true intersection (a per-doc
    # scalar), so  (shared_eligible + min(capped_a, capped_b))
    # / min(n_a, n_b)  is an UPPER bound on containment: filtering on it
    # can never drop a qualifying pair, and it eliminates the
    # one-shared-gram junk candidates that otherwise dominate the
    # array-verify join (measured at the 2x-sf1 decade: 24.6M candidate
    # pairs of which ~0.05% survive — the array join was 10x superlinear
    # from exactly this).
    shared = (
        p.alias("a")
        .join(
            p.alias("b"),
            on=[
                F.col("a._g") == F.col("b._g"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    capped = (
        posting.join(
            posting.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_gram_df)
            .select("_g"),
            "_g",
        )
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_capped"))
    )
    meta = (
        sized.select("_id", "_n")
        .join(capped, "_id", "left")
        .select(
            "_id", "_n", F.coalesce("_capped", F.lit(0)).alias("_capped")
        )
    )
    ma = meta.select(
        F.col("_id").alias("id_a"),
        F.col("_n").alias("n_a"),
        F.col("_capped").alias("_ca"),
    )
    mb = meta.select(
        F.col("_id").alias("id_b"),
        F.col("_n").alias("n_b"),
        F.col("_capped").alias("_cb"),
    )
    # The gate uses the SAME comparison form as the final verify
    # (double division >= threshold), not a ceil of a float product: a
    # float ceil can round up across an integer boundary and demand one
    # more shared gram than the verify itself requires, dropping a pair
    # sitting exactly at the threshold. Division is monotone in the
    # numerator, and the numerator here upper-bounds the true
    # intersection, so upper-bound-passes provably implies verify-passes.
    plausible = (
        shared.join(ma, "id_a")
        .join(mb, "id_b")
        .filter(
            (F.col("_shared") + F.least("_ca", "_cb"))
            / F.least("n_a", "n_b")
            >= threshold
        )
        .select("id_a", "id_b")
    )
    sa = sized.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("_sa"), F.col("_n").alias("n_a")
    )
    sb = sized.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("_sb"), F.col("_n").alias("n_b")
    )
    return (
        plausible.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.size(F.array_intersect("_sa", "_sb")) / F.least("n_a", "n_b"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a", "id_b", "n_a", "n_b",
            F.round("containment", 6).alias("containment"),
        )
    )


def segment_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 8,
    max_freq: int = 2,
) -> DataFrame:
    """C4-style corpus-wide "line" deduplication, adapted to the
    newline-free corpus: the "line" unit is a non-overlapping
    ``seg_words``-word segment. Any segment whose corpus-wide frequency
    exceeds ``max_freq`` is removed from EVERY document it appears in
    (C4 drops lines occurring ≥3 times across the corpus); surviving
    segments are reassembled in order into the rewritten text.

    Scale shape: segmentation is a narrow map (sequence + slice inside
    codegen, rows × ~n_words/seg_words); the corpus frequency is a
    combinable groupBy joined back on the segment text — deliberately
    NOT a window count: the hot segments C4 exists to remove would all
    land in one window partition, while a groupBy gets map-side partial
    counts and the join back is AQE-skew-splittable. Reassembly
    shuffles once on the doc id with collect_list over the per-doc
    handful of segments. No all-pairs anything — cost is O(total
    segments), which is how the C4 pipeline runs at web scale.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+"),
        lambda t: t != F.lit(""),
    )
    from ..functions.partitioning import ensure_scan_parallelism

    n_segs = F.expr(f"(size(_toks) + {seg_words - 1}) div {seg_words}")
    segs = ensure_scan_parallelism(df).select(
        F.col(id_col), toks.alias("_toks")
    ).select(
        id_col,
        F.posexplode(
            F.transform(
                # sequence(0, -1) DESCENDS to [0, -1] for a zero-token
                # doc (n_segs = 0), emitting phantom empty segments the
                # oracle's range(0) never produces — guard to an empty
                # array so empty/punctuation-only docs drop out of
                # posexplode on both engines.
                F.when(
                    n_segs > F.lit(0), F.sequence(F.lit(0), n_segs - 1)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.array_join(
                    F.slice(F.col("_toks"), i * seg_words + 1, seg_words), " "
                ),
            )
        ).alias("seg_idx", "seg_text"),
    )
    freq = segs.groupBy("seg_text").agg(F.count(F.lit(1)).alias("_freq"))
    flagged = segs.join(freq, "seg_text").select(
        id_col,
        "seg_idx",
        "seg_text",
        (F.col("_freq") <= max_freq).alias("_keep"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("seg_idx", "seg_text"),
                            )
                        )
                    ),
                    lambda s: s["seg_text"],
                ),
                " ",
            ).alias("new_text"),
        )
        .orderBy(id_col)
    )


def dedup_eval(
    found: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Precision/recall of a candidate-pair generator against planted
    ground truth — "measure, don't guess" for the dedup path itself:
    a banding config is only as good as the recall it buys, and this
    makes that number a first-class (and oracle-checkable) relation
    instead of a notebook anecdote.

    Both inputs are (id_a, id_b) pair relations (canonical order
    expected); the eval is one full-outer join on the pair key plus a
    single-row aggregate: tp/fp/fn counts and exact milli
    precision/recall (truncating div on non-negative integers — engine
    agnostic). NULL precision when nothing was found; NULL recall when
    truth is empty (degenerate evals stay visible, not 0-or-crash).
    """
    f = found.select(id_a, id_b).distinct().withColumn("_f", F.lit(1))
    t = truth.select(id_a, id_b).distinct().withColumn("_t", F.lit(1))
    j = f.join(t, [id_a, id_b], "full_outer")
    agg = j.agg(
        F.sum(
            (F.col("_f").isNotNull() & F.col("_t").isNotNull()).cast("bigint")
        ).alias("tp"),
        F.sum(
            (F.col("_f").isNotNull() & F.col("_t").isNull()).cast("bigint")
        ).alias("fp"),
        F.sum(
            (F.col("_f").isNull() & F.col("_t").isNotNull()).cast("bigint")
        ).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        # 1000 * tp computed in DECIMAL(38,0): tp is a PAIR count, which a
        # 1000x-scale corpus can push past 2^63/1000 — same hardening
        # class (and same fix) as the round-5 share/weight arithmetic
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0)) * tp) div (tp + fp)"
                " AS BIGINT)"
            ),
        ).alias("precision_milli"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0)) * tp) div (tp + fn)"
                " AS BIGINT)"
            ),
        ).alias("recall_milli"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram,
    slide a window of ``w`` consecutive hashes, and keep each window's
    minimum (ties to the RIGHTMOST position, the paper's rule that makes
    overlapping windows re-select the same gram). Guarantees: any shared
    substring of length >= k + w - 1 between two documents yields at
    least one shared fingerprint, while storing ~2/(w+1) of all grams —
    the local-sampling property that makes winnowing the standard
    plagiarism / near-dup screen where MinHash (a GLOBAL sample) can
    miss short shared passages.

    Hashes are `md5_hash60` on the whitespace-normalized lowercased
    gram, so the whole selection — every window argmin — replays in
    DuckDB. Documents shorter than ``k`` chars contribute their single
    truncated gram; documents with fewer than ``w`` grams get one
    partial window (global min).

    Output: (id, pos, fp_hash), one row per SELECTED fingerprint —
    distinct (gram position, hash) pairs per document.

    Scale shape (round 12 — r11 verdict #5): the whole selection is a
    NARROW per-document, integer-only computation — hash the gram array
    in place, then one TRANSFORM over ``sequence(0, n-w)`` whose
    element is the window's argmin POSITION via an integer ``aggregate``
    (``hs[p] <= hs[acc]`` with ascending p implements the paper's
    rightmost-tie rule), then ``array_distinct`` over the int array and
    one explode.  Zero shuffles and no row expansion; the previous form
    exploded every gram into its w member windows (x``w`` rows) and
    took a per-(doc, window) ``row_number`` over a shuffle.  Positions
    (not (hash, pos) structs) are what's deduplicated because
    ``array_distinct`` is hash-based for primitives but quadratic-
    with-ordering for structs — measured 2.2x of the whole operator's
    time on struct picks.  The fingerprint relation this emits is the
    bounded artifact downstream overlap joins consume."""
    from ..functions.hashing import md5_hash60
    from ..functions.partitioning import ensure_scan_parallelism
    from ..functions.text import char_ngrams

    # per-gram md5 is the dominant cost and fuses into the docs scan —
    # spread an unsplittable scan first (measured 5.4 s -> 3.3 s at
    # sf0.1, where the docs table is one parquet row group = one task)
    hashed = ensure_scan_parallelism(docs).select(
        F.col(id_col).alias("_id"),
        F.transform(
            char_ngrams(F.col(text_col), k), lambda g: md5_hash60(g)
        ).alias("_hs"),
    ).filter(F.size("_hs") >= 1)
    n = F.size("_hs")
    hs = F.col("_hs")
    # Window starts 0 .. max(n-w, 0); each window's pick is the argmin
    # position over [s, min(s+w-1, n-1)] — min hash, ties to the
    # RIGHTMOST position (<= with ascending p), identical to the old
    # row_number(orderBy(fp_hash asc, pos desc)) == 1 selection.  The
    # n == 1 guard keeps the inner sequence ascending (sequence(1, 0)
    # would DESCEND and index past the array).
    pick_pos = F.when(
        n == 1, F.array(F.lit(0))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - F.lit(w), F.lit(0))),
            lambda s: F.aggregate(
                F.sequence(s + 1, F.least(s + F.lit(w - 1), n - F.lit(1))),
                s,
                lambda acc, p: F.when(
                    F.element_at(hs, p + 1) <= F.element_at(hs, acc + 1), p
                ).otherwise(acc),
            ),
        )
    )
    return (
        hashed.select(
            "_id", "_hs", F.explode(F.array_distinct(pick_pos)).alias("_p")
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_p").cast("int").alias("pos"),
            F.element_at(hs, F.col("_p") + 1).alias("fp_hash"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 50,
) -> DataFrame:
    """Cross-document overlap candidates from winnowing fingerprints:
    pairs of documents sharing >= ``min_shared`` DISTINCT fingerprint
    hashes — the passage-level near-dup screen (shared substrings of
    length >= k+w-1 are guaranteed to collide; see
    :func:`winnow_fingerprints`).

    Output: (id_a, id_b, n_shared) with id_a < id_b, ordered by
    n_shared desc then ids.

    Scale shape: posting-list self-join on the fingerprint hash with a
    document-frequency cap (hashes present in > ``max_fp_df`` documents
    are boilerplate and dropped BEFORE the join — the same quadratic
    guard as containment_pairs), then one combinable pair count. Never
    all-pairs."""
    # distinct (id, hash) fingerprints feed BOTH the df-cap count and the
    # posting join; checkpoint so the whole winnowing pipeline (explode +
    # window argmin) runs once, not once per branch
    fps = (
        winnow_fingerprints(docs, text_col, id_col, k=k, w=w)
        .select(F.col(id_col).alias("_id"), "fp_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    eligible = (
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_fp_df)
        .select("fp_hash")
    )
    posting = fps.join(eligible, "fp_hash")
    a = posting.select(F.col("fp_hash"), F.col("_id").alias("id_a"))
    b = posting.select(F.col("fp_hash"), F.col("_id").alias("id_b"))
    pairs = (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.orderBy(
        F.col("n_shared").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
