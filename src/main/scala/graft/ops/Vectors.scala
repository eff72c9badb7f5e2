package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExpressions.dotProduct
import Util._

/** SURVEY.md §2.11 — vector similarity over the embeddings table.
  *
  * Vector math runs through graft's native codegen kernels
  * (`graft.functions.DotProduct` — a fused multiply-add loop inside
  * WholeStageCodegen); the HOF formulation it replaces allocated a
  * zipped array per pair and fell out of codegen. Sums are
  * left-to-right so the oracle (list_reduce over an index transform)
  * produces the bit-identical IEEE sum.
  *
  * Scale notes (100 TB): brute-force top-k against ONE query vector is a
  * single scan + TakeOrderedAndProject — linear and fine at any scale.
  * The pairwise knn join is quadratic by definition; at scale the same
  * shape runs through an LSH bucketing join (random-hyperplane signatures
  * — the a_dedup_minhash banding pattern with sign bits), keeping the
  * exact cosine only on in-bucket candidates.
  */
object Vectors {

  /** Elementwise double view of a float-vector column. */
  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column = dotProduct(a, b)

  /** cosine(a, b) — caller rounds for cross-engine output. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Top-10 most cosine-similar vectors to the vec_id=0 query vector. */
  def qSimSearchTopk(s: SparkSession, sf: String): DataFrame = {
    val e = Tables.embeddings(s, sf)
    val q = broadcast(e.where(col("vec_id") === 0)
      .select(col("embedding").as("query_vec")))
    e.crossJoin(q)
      .select(col("vec_id"),
              round(cosine(dvec(col("embedding")), dvec(col("query_vec"))), 4).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Top-20 most-similar pairs (vec_id < vec_id). Norms are precomputed
    * per vector (once, not per pair) on both engines. */
  def qSimKnnJoin(s: SparkSession, sf: String): DataFrame = {
    val v = Tables.embeddings(s, sf)
      .select(col("vec_id"), dvec(col("embedding")).as("dv"))
      .withColumn("nrm", sqrt(dot(col("dv"), col("dv"))))
    val a = v.select(col("vec_id").as("a_id"), col("dv").as("a_dv"), col("nrm").as("a_nrm"))
    val b = v.select(col("vec_id").as("b_id"), col("dv").as("b_dv"), col("nrm").as("b_nrm"))
    a.crossJoin(b)
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              round(dot(col("a_dv"), col("b_dv")) / (col("a_nrm") * col("b_nrm")), 4).as("sim"))
      .orderBy(desc("sim"), asc("a_id"), asc("b_id"))
      .limit(20)
  }

  /** Multimodal row: text metadata joined with its embedding; per-lang
    * aggregate of (rounded) vector norms — the rounded doubles sum
    * exactly through the decimal path. */
  def qMultimodalJoin(s: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(s, sf)
    val e = Tables.embeddings(s, sf)
    d.join(e, d("doc_id") === e("vec_id"))
      .where(col("label") < 5)
      .withColumn("norm_sq", round(dot(dvec(col("embedding")), dvec(col("embedding"))), 4))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
           sum(col("n_chars")).as("sum_chars"),
           (sum(col("norm_sq").cast(D)).cast("double") / count(lit(1))).as("avg_norm"))
      .orderBy("lang")
  }
}
