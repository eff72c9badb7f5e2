package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.11 — text dedup / analysis for LLM-pipeline corpora.
  *
  * Scale notes (100 TB): exact dedup is a hash group-by (one shuffle of
  * (hash, id) pairs — bytes per doc, not the doc). The exact Jaccard
  * join is blocked on (lang, length-band) via bucket-and-replicate so it
  * is an equi-join, not an all-pairs product; the unblocked at-scale
  * path is the MinHash-LSH banding join (`a_dedup_minhash`), which
  * shuffles only (band-key, id) pairs and computes exact Jaccard on the
  * candidate set alone.
  */
object TextDedup {

  /** Normalized text: lowercase, trimmed, whitespace collapsed. */
  private def norm: Column =
    lower(regexp_replace(trim(col("text")), "\\s+", " "))

  private def tokens: Column = array_distinct(split(col("text"), " "))

  /** Exact dedup on normalized-text hash; keep the smallest doc_id. */
  def qDedupExact(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .groupBy(md5(norm).as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Exact near-dup pairs: token-set Jaccard ≥ 0.6 between docs of the
    * same lang with |n_chars| within 25. The length band is implemented
    * as bucket-and-replicate (equi-join on (lang, bucket)), identical in
    * result to the oracle's theta predicate. */
  def qDedupJaccard(s: SparkSession, sf: String): DataFrame =
    bandedJaccardPairs(Tables.documents(s, sf), tokens, 0.6)

  /** Shared (lang, length-band) bucket-and-replicate exact-Jaccard join
    * used by the token-set and n-gram variants.
    *
    * Shuffle discipline (same as the LSH twins): ONLY (lang, bucket, id,
    * chars, |ft|) rides the banded candidate join — feature arrays
    * re-join after candidate generation, so the join shuffle is a few
    * dozen bytes per candidate instead of two full feature arrays per
    * pair (at round-2 bench the array-carrying join dominated cost).
    * Each pair survives in exactly one bucket (b's three replica values
    * are distinct), so no distinct() is needed.
    *
    * Features are hashed to 64-bit longs before the set math: 8-byte
    * elements instead of strings halve the verify-join payload and make
    * the per-pair intersect integer-compare cheap. A 64-bit collision
    * could in principle perturb one Jaccard value; at corpus vocabulary
    * sizes the probability is ~|vocab|²/2⁶⁴ ≈ 1e-8 — negligible.
    *
    * Exact size-ratio prune: J(A,B) ≥ τ implies |A∩B| ≥ τ(|A|+|B|)/(1+τ)
    * and |A∩B| ≤ min, hence min ≥ τ·max. The filter runs in integer
    * arithmetic at τ−1e-4 (the output rounds Jaccard to 4 decimals, so a
    * pair can legitimately round UP across the threshold; the 1e-4 slack
    * strictly covers that window) — no float boundary can drop a pair
    * the oracle keeps.
    *
    * |A∪B| = |A|+|B|-|A∩B| for distinct sets — one intersect per pair,
    * no union array materialized (the union alloc dominated pair cost).
    * An empty-features pair (0/0) scores 0.0 on both engines, never
    * NaN (Spark NaN-is-largest would smuggle it past the threshold;
    * DuckDB 0/0 is NULL). */
  private def bandedJaccardPairs(docs: DataFrame, features: Column,
                                 tau: Double): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"),
                        array_distinct(transform(features, t => xxhash64(t))).as("ft"))
      .withColumn("n_ft", size(col("ft")))
    val a = d.select(col("doc_id").as("a_id"), col("lang"),
                     col("n_chars").as("a_chars"), col("n_ft").as("a_n"))
      .withColumn("bucket", floor(col("a_chars") / 25))
    val b = d.select(col("doc_id").as("b_id"), col("lang"),
                     col("n_chars").as("b_chars"), col("n_ft").as("b_n"))
      .withColumn("bucket", explode(array(floor(col("b_chars") / 25) - 1,
                                          floor(col("b_chars") / 25),
                                          floor(col("b_chars") / 25) + 1)))
    val tauNum = math.round(tau * 10000) - 1  // τ−1e-4 in integer space
    val cand = a.join(b, Seq("lang", "bucket"))
      .where(col("a_id") < col("b_id") &&
             abs(col("a_chars") - col("b_chars")) <= 25 &&
             least(col("a_n"), col("b_n")) * 10000 >=
               lit(tauNum) * greatest(col("a_n"), col("b_n")))
      .select("a_id", "b_id", "a_n", "b_n")
    val inter = size(array_intersect(col("a_ft"), col("b_ft")))
    val denom = col("a_n") + col("b_n") - inter
    val jac = when(denom > 0, inter.cast("double") / denom).otherwise(lit(0.0))
    cand
      .join(d.select(col("doc_id").as("a_id"), col("ft").as("a_ft")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("ft").as("b_ft")), "b_id")
      .withColumn("jaccard", round(jac, 4))
      .where(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** MinHash-LSH near-dup at scale (approx twin of q_dedup_jaccard; no
    * oracle — murmur3 signatures are engine-specific).
    *
    * 32 minhashes banded as 16 bands × 2 rows: collision probability at
    * j=0.6 is 1-(1-0.36)^16 ≈ 0.999, so recall vs the exact twin is
    * high; candidates are then verified with exact Jaccard so precision
    * is 1.0. Only (band-key, doc_id) pairs shuffle — never all pairs.
    *
    * The LSH bucket key includes the twin's blocking metadata (lang) and
    * the candidate filter applies its length band (|Δchars| ≤ 25) BEFORE
    * the distinct — on a dup-heavy corpus the un-blocked band buckets go
    * quadratic (the sf0.1 fixture produces ~400M raw candidates without
    * this; ~8M with it). Block-by-metadata-then-LSH-within-block is the
    * standard at-scale composition, and it only removes pairs the exact
    * twin also excludes, so recall vs the twin is unchanged.
    */
  def aDedupMinhash(s: SparkSession, sf: String): DataFrame = {
    val nHashes = 32
    val rowsPerBand = 2
    val prime = 2147483647L
    val d = Tables.documents(s, sf).select(
      col("doc_id"), col("lang"), col("n_chars"), tokens.as("tk"))
    // minhash_i = min over tokens of an affine transform of murmur3(token)
    val sigs: Seq[Column] = (0 until nHashes).map { i =>
      val a = 2L * i + 1; val b = 104729L * (i + 1)
      array_min(transform(col("tk"),
        t => pmod(hash(t).cast("long") * a + b, lit(prime))))
    }
    // Band key: xxhash64(band-index, sig_0, sig_1) — a LONG, not a
    // concat string (8-byte shuffle keys and integer compares in the
    // sort-merge; the band index baked into the hash makes one flat key
    // space). A 64-bit hash collision can only ADD a candidate pair,
    // and every candidate is exact-Jaccard-verified, so correctness is
    // unaffected.
    val bands: Column = array((0 until nHashes / rowsPerBand).map { j =>
      xxhash64((lit(j) +: sigs.slice(j * rowsPerBand, (j + 1) * rowsPerBand)): _*)
    }: _*)
    // Candidate generation on (lang, key, id, chars) ONLY — the token
    // arrays must not ride through the join/distinct (at scale the
    // candidate set is orders of magnitude larger than the doc set;
    // shuffling arrays with it is the classic LSH blow-up). Tokens
    // re-join after dedup.
    val exploded = d.select(col("doc_id"), col("lang"), col("n_chars"),
                            explode(bands).as("key"))
    val left = exploded.select(col("lang"), col("key"),
                               col("doc_id").as("a_id"), col("n_chars").as("a_chars"))
    val right = exploded.select(col("lang"), col("key"),
                                col("doc_id").as("b_id"), col("n_chars").as("b_chars"))
    val pairs = left.join(right, Seq("lang", "key"))
      .where(col("a_id") < col("b_id") &&
             abs(col("a_chars") - col("b_chars")) <= 25)
      .select("a_id", "b_id").distinct()
    val inter = size(array_intersect(col("a_tk"), col("b_tk")))
    val jac = inter.cast("double") /
              (size(col("a_tk")) + size(col("b_tk")) - inter)
    pairs
      .join(d.select(col("doc_id").as("a_id"), col("tk").as("a_tk")), "a_id")
      .join(d.select(col("doc_id").as("b_id"), col("tk").as("b_tk")), "b_id")
      .withColumn("jaccard", round(jac, 4))
      .where(col("jaccard") >= 0.6)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** n-gram (word-bigram shingle) Jaccard near-dup — order-sensitive,
    * unlike the token-SET variant: on this corpus the bag-of-words
    * lookalikes score ≤ 0.1 while true duplicates score 1.0, so shingle
    * Jaccard separates them cleanly. Same (lang, length-band) blocking
    * and bucket-and-replicate join as q_dedup_jaccard. */
  def qDedupNgram(s: SparkSession, sf: String): DataFrame = {
    val tk = split(col("text"), " ")
    // guard the 1-token doc: sequence(0, -1) would count DOWN in Spark
    // while the oracle's range(0) is empty
    val grams = when(size(tk) >= 2,
      array_distinct(transform(sequence(lit(0), size(tk) - 2),
        i => concat_ws(" ", slice(tk, i + 1, lit(2))))))
      .otherwise(array().cast("array<string>"))
    bandedJaccardPairs(Tables.documents(s, sf), grams, 0.5)
  }

  /** SimHash near-dup at scale (no oracle — xxhash64 is engine-specific).
    *
    * 32-bit SimHash per doc: bit j is the sign of Σ over distinct tokens
    * of ±1 by token-hash bit j. Candidate generation bands the signature
    * into 4 × 8-bit chunks — two docs within Hamming distance 3 of each
    * other must agree on ≥ 1 full chunk (pigeonhole), so the banding
    * equi-join (blocked by lang like the Jaccard twin) has guaranteed
    * recall 1.0 for d ≤ 3; candidates verify with exact
    * `bit_count(xor)`. Same shuffle discipline as MinHash-LSH: only
    * (lang, band, chunk, id, sig) rides the join, never token arrays.
    */
  def aDedupSimhash(s: SparkSession, sf: String): DataFrame = {
    val nBits = 32
    val nBands = 4
    val bitsPerBand = nBits / nBands
    val d0 = Tables.documents(s, sf).select(
      col("doc_id"), col("lang"), col("n_chars"), tokens.as("tk"))
    // bit j of the signature: sign of the ±1 vote sum over tokens
    val sig: Column = (0 until nBits).map { j =>
      val vote = aggregate(col("tk"), lit(0L),
        (acc, t) => acc + (shiftright(xxhash64(t), j).bitwiseAND(1) * 2 - 1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val d = d0.withColumn("sig", sig)
    val chunks: Column = array((0 until nBands).map { k =>
      shiftright(col("sig"), k * bitsPerBand).bitwiseAND((1 << bitsPerBand) - 1)
    }: _*)
    val exploded = d.select(col("doc_id"), col("lang"), col("n_chars"), col("sig"),
                            posexplode(chunks).as(Seq("band", "chunk")))
    val left = exploded.select(col("lang"), col("band"), col("chunk"),
                               col("doc_id").as("a_id"), col("n_chars").as("a_chars"),
                               col("sig").as("a_sig"))
    val right = exploded.select(col("lang"), col("band"), col("chunk"),
                                col("doc_id").as("b_id"), col("n_chars").as("b_chars"),
                                col("sig").as("b_sig"))
    left.join(right, Seq("lang", "band", "chunk"))
      .where(col("a_id") < col("b_id") &&
             abs(col("a_chars") - col("b_chars")) <= 25)
      .select(col("a_id"), col("b_id"),
              bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  /** Corpus stats per (lang, source); integer sums stay exact. */
  def qTextStats(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           (sum(size(split(col("text"), " "))).cast("double") / count(lit(1)))
             .as("avg_tokens"))
      .orderBy("lang", "source")

  /** Top-50 term frequencies (word-count over the corpus). */
  def qTextTf(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(50)
}
