"""Deduplication operators for training-data pipelines (SURVEY.md §2.11
x01/x02): exact hash dedup, n-gram Jaccard, MinHash+LSH, SimHash.

Reference parity: the reference's only dedup is UNIQUE(hash_registro) +
ON CONFLICT DO NOTHING (etl/etl_ida.py:534, schema_star.sql:93) — the exact
path here.  Near-dup is the driver-mandated extension.

Scale design (the whole point of these implementations):
- Exact dedup = hash → row_number per hash → keep first.  One shuffle on the
  hash; deterministic winner (unlike dropDuplicates).
- MinHash+LSH avoids the O(n²) pair space: signatures are per-row built-in
  expressions (no UDF), banding explodes each doc into `bands` rows, and
  candidates come from an equi-join on (band, band_hash) — shuffle-join
  friendly, no cartesian anywhere.  Verification re-joins shingle sets only
  for candidate pairs.
- SimHash: 64-bit signature via additive bit voting folded with built-in
  higher-order functions; candidate pairs via 16-bit chunk banding
  (Hamming-distance ≤ 3 ⇒ at least one of 4 chunks equal, pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import let1
from ..functions.textstats import ngram_shingles, tokens


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, hash_col: Column, id_col: str) -> DataFrame:
    """Keep the lowest-id row per hash value (ON CONFLICT DO NOTHING with a
    deterministic winner).  Adds ``hash_registro`` and ``n_dups``."""
    w = Window.partitionBy("hash_registro").orderBy(id_col)
    return (
        df.withColumn("hash_registro", hash_col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(Window.partitionBy("hash_registro")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------- jaccard

def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two (distinct-element) arrays — exact ints → exact
    double division, oracle-reproducible."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union.cast("double")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Brute-force O(n²) near-dup pairs by word-n-gram Jaccard — the
    correctness baseline the LSH path is tested against.  Only for bounded
    inputs (the caller pre-filters); at scale use minhash_lsh_pairs."""
    sh = df.select(
        F.col(id_col).alias("id"), ngram_shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- minhash

def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k-wide MinHash signature (array<long>): for hash-family member i,
    min over shingles of xxhash64(i, shingle).  Pure expression — one row
    in, one row out, no shuffle.  The shingle array is let-bound so
    CollapseProject cannot inline (= recompute) it per hash function;
    seeds come from the sequence values themselves (hash of an int column
    equals hash of the same int literal).

    NB: every transform lambda takes exactly ONE parameter — F.transform
    binds a second parameter to the array index, which silently overrides
    closure/default-arg seeds."""
    return let1(
        shingles,
        lambda sh: F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
        ),
    )


def _banded_minhash_pandas(sh_df: DataFrame, k: int, bands: int) -> DataFrame:
    """(id, sh: array<string>) → (id, band, bh) with the whole
    shingle→signature→band-hash chain vectorized in numpy per Arrow batch.

    Hash family: multiply-shift over a blake2b-64 base digest —
    h_i(s) = a_i·base(s) + b_i (mod 2⁶⁴), a_i odd, constants from a fixed
    seed.  Signature minima via np.minimum.reduceat over the flattened
    shingle array (one pass per hash function keeps peak memory at one
    uint64 vector, not a k×total matrix).  Band hash = seeded
    multiply-mix of the band's r minima.  Same banding statistics as the
    expression path (any uniform family gives the (1/b)^(1/r) curve);
    measured ~3× faster at sf0.1 because interpreted per-element HOF
    evaluation becomes dense vector code."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(10423)
    mul = rng.integers(1, 2**62, size=k, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    add = rng.integers(0, 2**62, size=k, dtype=np.uint64)
    r = k // bands
    mix = rng.integers(1, 2**62, size=r, dtype=np.uint64) * np.uint64(2) + np.uint64(1)

    def gen(batches):
        from hashlib import blake2b

        for pdf in batches:
            if pdf.empty:
                continue
            shingle_lists = pdf["sh"].to_numpy()
            lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
            flat = [x for s in shingle_lists for x in s]
            base = np.array(
                [
                    int.from_bytes(
                        blake2b(x.encode(), digest_size=8).digest(), "big"
                    )
                    for x in flat
                ],
                dtype=np.uint64,
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            n_docs = len(shingle_lists)
            sig = np.empty((k, n_docs), dtype=np.uint64)
            for i in range(k):
                sig[i] = np.minimum.reduceat(mul[i] * base + add[i], starts)
            band_sig = sig.T.reshape(n_docs, bands, r)
            bh = (band_sig * mix).sum(axis=2, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), n_docs),
                    "bh": np.ascontiguousarray(bh.reshape(-1)).view(np.int64),
                }
            )

    return sh_df.mapInPandas(gen, schema="id long, band int, bh long")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 30,
    bands: int = 10,
    threshold: float = 0.5,
    arrow: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Plan shape: shingle (map) → signature (map) → explode to `bands` rows
    (map) → shuffle on (band, band_hash) → self-join → distinct candidate
    pairs → re-join shingles → verify.  Candidate volume scales with true
    collisions, never with n².

    Default k=30/bands=10 (r=3): LSH threshold (1/b)^(1/r) ≈ 0.46 —
    centered just below the 0.5 verify threshold.  P(candidate) at j=0.6
    is 0.91 and ≈1 by j=0.8, while unrelated docs (j≈0.03) collide with
    P≈3e-4, keeping the candidate set ~collisions-sized, not O(n²).
    The exact-Jaccard verification removes surviving false candidates.

    ``arrow=True`` (default) computes shingle-hash/signature/band-hash in
    one numpy pass per Arrow batch (_banded_minhash_pandas);
    ``arrow=False`` keeps the pure-expression xxhash64 path.  Candidate
    sets differ (different uniform hash families) but both sit on the
    same banding curve; the exact-Jaccard verification step makes the
    final pairs family-independent above the threshold.
    """
    rows_per_band = k // bands
    sh = df.select(
        F.col(id_col).alias("id"), ngram_shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)

    if arrow:
        banded = _banded_minhash_pandas(sh, k, bands)
    else:
        # signature → per-band hashes inside one let-bound expression: the
        # signature is computed once per row even though each band
        # references rows_per_band of its elements (CollapseProject would
        # otherwise recompute it bands× per row).
        def band_hashes(sig: Column) -> Column:
            return F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at(sig, b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )

        banded = sh.select(
            "id",
            F.explode(
                let1(minhash_signature(F.col("sh"), k), band_hashes)
            ).alias("e"),
        ).select("id", "e.band", "e.bh")

    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- simhash

def simhash64(text_col: str) -> Column:
    """64-bit SimHash (bigint) as a single expression, JVM-side.

    Tokens are hashed ONCE into a let-bound array (the single-element
    transform = SQL-level let1); the per-bit vote then reads bits of the
    precomputed hashes — O(|tokens| + 64·|tokens|) integer ops instead of
    64·|tokens| xxhash evaluations (CollapseProject would otherwise inline
    the split+hash per bit)."""
    return F.expr(
        f"""
        element_at(
          transform(
            array(transform(split(trim({text_col}), '\\\\s+'), t -> xxhash64(t))),
            hs -> aggregate(sequence(0, 63), 0L, (acc, b) -> acc + IF(
                    aggregate(hs, 0L,
                              (v, h) -> v + CASE WHEN shiftright(h, b) & 1 = 1
                                            THEN 1L ELSE -1L END) > 0,
                    shiftleft(1L, b), 0L))
          ), 1)
        """
    )


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """Attach a 64-bit SimHash column (bigint)."""
    return df.withColumn(out_col, simhash64(text_col))


def _simhash_pandas(df: DataFrame, id_name: str, text_name: str) -> DataFrame:
    """(id, text) → (id, simhash) with tokenize/hash/bit-vote vectorized
    in numpy per Arrow batch: token base hashes (blake2b-64) unpacked to a
    bit matrix, per-doc ±1 votes summed with np.add.reduceat, sign bits
    repacked little-endian (bit j == the expression path's
    shiftright(h,j)&1 convention).  Same SimHash semantics, different
    (still uniform) token hash family; measured ~4× over the interpreted
    64·|tokens| fold."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        from hashlib import blake2b

        for pdf in batches:
            if pdf.empty:
                continue
            token_lists = [
                (t.split() or [""]) for t in pdf[text_name].to_numpy()
            ]
            lens = np.array([len(t) for t in token_lists], dtype=np.int64)
            flat = [x for t in token_lists for x in t]
            base = np.array(
                [
                    int.from_bytes(
                        blake2b(x.encode(), digest_size=8).digest(), "big"
                    )
                    for x in flat
                ],
                dtype=np.uint64,
            )
            bits = np.unpackbits(
                base.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int32)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            votes = np.add.reduceat(2 * bits - 1, starts, axis=0)
            packed = np.packbits(
                (votes > 0).astype(np.uint8), axis=1, bitorder="little"
            )
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name].to_numpy(),
                    "simhash": np.ascontiguousarray(packed).view(
                        np.uint64
                    )[:, 0].view(np.int64),
                }
            )

    return df.mapInPandas(gen, schema=f"{id_name} long, simhash long")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    arrow: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidates via 16-bit chunk banding: distance ≤ 3 ⇒ ≥1 of the 4 chunks
    is identical (pigeonhole), so an equi-join on (chunk_idx, chunk_value)
    finds all true pairs without a cartesian product.

    ``arrow=True`` (default) computes the signature in a vectorized Arrow
    batch (_simhash_pandas); ``arrow=False`` keeps the pure-expression
    path.  Chunk banding and verification are identical either way.
    """
    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    # one let-bound explode: simhash evaluated once per row even though
    # five expressions reference it (output + 4 chunk masks)
    def chunk_rows(sh: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    sh.alias("simhash"),
                    F.lit(c).alias("chunk"),
                    sh.bitwiseAND(F.lit(signed64(0xFFFF << (16 * c)))).alias("cv"),
                )
                for c in range(4)
            ]
        )

    if arrow:
        sh_df = _simhash_pandas(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
            "id",
            "text",
        )
        chunks = sh_df.select(
            "id", F.explode(chunk_rows(F.col("simhash"))).alias("e")
        ).select("id", "e.simhash", "e.chunk", "e.cv")
    else:
        chunks = (
            df.select(F.col(id_col).alias("id"), text_col)
            .select(
                "id", F.explode(let1(simhash64(text_col), chunk_rows)).alias("e")
            )
            .select("id", "e.simhash", "e.chunk", "e.cv")
        )
    return (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.cv") == F.col("y.cv"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        # filter BEFORE distinct: most candidates exceed max_hamming, so
        # the dedup shuffle sees only true pairs (order of magnitude less)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
