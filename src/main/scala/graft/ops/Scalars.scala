package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.8 — scalar function surface (string / date / math /
  * conditional / cast / array / HOF / map / json).
  *
  * Everything here is a narrow per-row projection over one scan — fully
  * codegen'd, no shuffle except the deterministic output orderBy. No
  * UDFs anywhere: higher-order functions cover the array/vector math
  * (SURVEY.md §1.3), keeping Catalyst visibility and codegen.
  */
object Scalars {

  def qFnString(s: SparkSession, sf: String): DataFrame =
    Tables.part(s, sf)
      .select(col("p_partkey"),
              upper(col("p_name")).as("uname"),
              lower(col("p_type")).as("ltype"),
              substring(col("p_name"), 1, 5).as("prefix"),
              length(col("p_name")).as("name_len"),
              trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
              concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
              regexp_replace(col("p_name"), " ", "_").as("snake"),
              regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
      .orderBy("p_partkey")

  /** Date/time kit. Spark's dayofweek is 1=Sunday; the oracle uses
    * dow+1 to match (DuckDB dow is 0=Sunday). */
  def qFnDate(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(col("event_id"),
              date_trunc("hour", col("ts")).as("hour_ts"),
              date_trunc("day", col("ts")).as("day_ts"),
              year(col("ts")).as("y"),
              month(col("ts")).as("m"),
              dayofmonth(col("ts")).as("d"),
              dayofweek(col("ts")).as("dow1"),
              datediff(lit("2024-12-31").cast("date"), col("ts")).as("days_left"),
              (col("ts") + expr("INTERVAL 36 HOURS")).as("ts_plus"))
      .orderBy("event_id")

  def qFnMath(s: SparkSession, sf: String): DataFrame =
    Tables.part(s, sf)
      .select(col("p_partkey"),
              abs(col("p_retailprice") - 950).as("abs_diff"),
              // double, not Spark's native LONG: DuckDB ceil/floor return
              // DOUBLE and the driver hash is dtype-class-sensitive (§7.3)
              ceil(col("p_retailprice")).cast("double").as("ceil_price"),
              floor(col("p_retailprice")).cast("double").as("floor_price"),
              round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
              round(log(col("p_retailprice")), 4).as("ln_price"),
              round(exp(col("p_retailprice") / 1000), 4).as("exp_scaled"),
              round(pow(col("p_retailprice"), 1.5), 2).as("pow_price"),
              pmod(col("p_partkey"), lit(7)).as("key_mod"),
              signum(col("p_retailprice") - 950).as("sign_diff"))
      .orderBy("p_partkey")

  def qFnConditional(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(col("o_orderkey"),
              when(col("o_totalprice") > 300000, "high")
                .when(col("o_totalprice") > 150000, "mid")
                .otherwise("low").as("tier"),
              expr("if(o_orderstatus = 'O', 'open', 'closed')").as("state"),
              nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")).as("prio"),
              greatest(col("o_totalprice"), lit(100000.0)).as("floor100k"),
              least(col("o_totalprice"), lit(100000.0)).as("cap100k"))
      .orderBy("o_orderkey")

  def qFnCast(s: SparkSession, sf: String): DataFrame =
    Tables.orders(s, sf)
      .select(col("o_orderkey"),
              col("o_orderkey").cast("string").as("key_str"),
              // decimal math stays internal; a decimal-typed OUTPUT column
              // is hash-hostile (pyarrow object vs DuckDB float64, §7.3)
              col("o_totalprice").cast("decimal(18,4)").cast("double").as("price_dec"),
              col("o_totalprice").cast("bigint").as("price_int"),
              col("o_orderdate").cast("string").as("date_str"),
              // DATE-typed output reads as pandas object (datetime.date)
              // while DuckDB DATE converts to datetime64 — emit the
              // truncated value as TIMESTAMP on both sides (§7.3)
              col("o_orderdate").cast("date").cast("timestamp").as("date_only"),
              lit("2024-03-15 12:30:00").cast("timestamp").as("fixed_ts"))
      .orderBy("o_orderkey")

  /** Token-array kit over documents.text (whitespace-tokenized corpus).
    * Array intermediates are flattened to '|'-joined strings on output —
    * array-typed output columns break the grading harness (§7.3(6)). */
  def qFnArray(s: SparkSession, sf: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, sf)
      .select(col("doc_id"),
              size(toks).as("n_tokens"),
              array_contains(toks, "key").as("has_key"),
              concat_ws("|", slice(toks, 1, 5)).as("first5"),
              concat_ws("|", sort_array(array_distinct(toks))).as("vocab"),
              size(array_distinct(toks)).as("n_distinct"))
      .orderBy("doc_id")
  }

  /** Higher-order-function vector math (no UDF): elementwise transform +
    * left-fold aggregate. The oracle folds with list_reduce in the same
    * left-to-right order so the IEEE double sums are bit-identical. */
  def qFnArrayHof(s: SparkSession, sf: String): DataFrame = {
    val dvec = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, sf)
      .select(col("vec_id"),
              round(aggregate(dvec, lit(0.0), (acc, x) => acc + x), 4).as("vec_sum"),
              round(aggregate(dvec, lit(0.0), (acc, x) => acc + x * x), 4).as("norm_sq"),
              round(aggregate(transform(dvec, x => x * lit(2.0)), lit(0.0),
                              (acc, x) => acc + x), 4).as("doubled_sum"),
              size(filter(dvec, x => x > 0)).as("n_pos"))
      .orderBy("vec_id")
  }

  /** Map construction + access, flattened to scalar output columns (map
    * literals in output are hash-hostile across engines, §7.3(6)). */
  def qFnMap(s: SparkSession, sf: String): DataFrame = {
    val m = map(lit("type"), col("event_type"), lit("uid"), col("user_id").cast("string"))
    Tables.events(s, sf)
      .select(col("event_id"),
              element_at(m, "type").as("mtype"),
              element_at(m, "uid").as("muid"),
              concat_ws("|", sort_array(map_keys(m))).as("mkeys"),
              element_at(str_to_map(concat(lit("k="), get_json_object(col("props"), "$.k")),
                                    lit(","), lit("=")), "k").cast("int").as("k_via_map"))
      .orderBy("event_id")
  }

  /** from_json → field access → to_json roundtrip projected to scalars. */
  /** Regex scalar family: anchored capture extract, global replace,
    * and a match predicate — all per-row map-side expressions, patterns
    * held to the Java-regex ∩ RE2 shared subset (char classes,
    * alternation, anchors; no lookaround/backrefs) so both engines
    * compute identical matches. */
  def qFnRegex(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("n_after_devowel"),
        when(col("text").rlike("join( [a-z]+)? join"), 1L).otherwise(0L).as("near_dup_joins"))
      .orderBy("doc_id")

  /** Safe-cast / try scalar family — the malformed-input hygiene ops an
    * ingest pipeline needs: `try_cast` turns unparseable strings into
    * NULL instead of failing the job, `try_divide` turns /0 into NULL.
    * The substr slice deliberately lands on clean digits for some rows
    * and on junk (`9}`) for others, so both outcomes are exercised.
    * DuckDB mirrors with TRY_CAST and `x / nullif(y, 0)`. */
  def qFnTry(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .where(col("event_id") < 2000)
      .select(
        col("event_id"),
        expr("try_cast(substr(props, 7, 2) AS INT)").as("k2"),
        expr("try_divide(value, CAST(floor(value) AS BIGINT) % 7)").as("safe_rate"))
      .orderBy("event_id")

  /** Bitwise scalar family — mask/flag extraction over 64-bit ids (the
    * shard-routing / flag-word idiom): AND/OR/XOR, shifts, popcount.
    * All integer-exact on both engines; popcount width-normalized to
    * INT. Pure map-side projection, stays in whole-stage codegen. */
  def qFnBitwise(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .where(col("event_id") < 2000)
      .select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("band"),
        col("event_id").bitwiseOR(lit(4096L)).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        shiftleft(col("event_id"), 3).as("shl"),
        shiftright(col("event_id"), 2).as("shr"),
        bit_count(col("event_id")).cast("int").as("nbits"))
      .orderBy("event_id")

  def qFnJson(s: SparkSession, sf: String): DataFrame = {
    val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
    Tables.events(s, sf)
      .withColumn("k", parsed.getField("k"))
      .select(col("event_id"), col("k"),
              to_json(struct(col("event_type"), col("k"))).as("json_out"))
      .orderBy("event_id")
  }

  /** Spark 4 VARIANT — the semi-structured fast path: `parse_json`
    * decodes the props string ONCE into the binary variant encoding
    * and every `variant_get` is a typed offset read, where the
    * `get_json_object` form re-parses the text per extraction (and
    * `from_json` needs the schema up front — variant doesn't). The op
    * parses, extracts a typed field, and folds to a per-decile
    * distribution with exact integer sums; the scan, the parse, and
    * the extraction all ride one codegen span. The oracle reads the
    * same field through DuckDB's JSON path — identical values, so the
    * variant round-trip is verified against an independent decoder. */
  def qFnVariant(s: SparkSession, sf: String): DataFrame =
    Tables.events(s, sf)
      .select(expr("CAST(variant_get(parse_json(props), '$.k', 'int') AS BIGINT)")
        .as("k"))
      .groupBy(expr("k div 10").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("bucket")
}
