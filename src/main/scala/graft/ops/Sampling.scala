package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting — the
  * ops a training-data pipeline uses to carve train/val/test sets and
  * fixed-rate subsamples out of a 100 TB corpus.
  *
  * Everything here is a pure per-row expression of a stable key: no
  * RNG state, no `rand()` — so assignment is reproducible across runs,
  * engines, cluster sizes and row orders, survives re-partitioning, and
  * never shuffles. (Spark's `df.sample`/`rand(seed)` is deterministic
  * only for a fixed partitioning — a repartition or a second engine
  * reassigns rows; hash-of-key never does.) This is the standard
  * hash-split design used by large-scale data pipelines.
  *
  * The hash primitive is the low 56 bits of MD5 (little-endian), which
  * both Spark (`md5` hex + byte-reverse + `conv`) and DuckDB
  * (`md5_number_lower % 2^56`) can compute bit-identically — see
  * [[hashValueSql]] — so split assignment itself is oracle-checkable.
  * 56 bits keeps the value inside a signed long in both engines.
  */
object Sampling {

  /** Number of hex-char-pair start offsets (1-based, most-significant
    * first) of digest bytes 14 down to 8 in the md5 hex string — the
    * little-endian low 7 bytes of DuckDB's `md5_number_lower`. */
  private val leByteOffsets = Seq(29, 27, 25, 23, 21, 19, 17)

  /** 56-bit deterministic hash of `key` in [0, 2^56): equals
    * `md5_number_lower(key) % 2^56` in DuckDB. NULL key → NULL hash.
    *
    * Keys are hashed via their string form, so cross-engine parity
    * holds only for types whose rendering is canonical in both engines:
    * strings and integral types. Float/decimal/timestamp keys render
    * engine-specifically (Spark "1.0E10" vs DuckDB "10000000000.0") —
    * cast such keys to string yourself, canonically, first. */
  def hashValue(key: Column): Column = {
    val hex = md5(key.cast("string").cast("binary"))
    val le = concat(leByteOffsets.map(i => substring(hex, i, 2)): _*)
    conv(le, 16, 10).cast("long")
  }

  /** DuckDB SQL computing exactly [[hashValue]] of `keyExpr`. */
  def hashValueSql(keyExpr: String): String =
    s"CAST(md5_number_lower(CAST($keyExpr AS VARCHAR)) % 72057594037927936 AS BIGINT)"

  /** Uniform bucket in [0, buckets) from the 56-bit hash. Bias from the
    * non-dividing modulus is < buckets/2^56 — negligible for any sane
    * bucket count. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    hashValue(key) % buckets
  }

  def hashBucketSql(keyExpr: String, buckets: Int): String =
    s"${hashValueSql(keyExpr)} % $buckets"

  private def validateSplits(splits: Seq[(String, Int)]): Unit = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits must be positive")
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
  }

  /** Bucket-to-label table: label of every bucket in [0, 100). */
  private def bucketLabels(splits: Seq[(String, Int)]): Seq[String] =
    splits.flatMap { case (label, pct) => Seq.fill(pct)(label) }

  /** Train/val/test-style split assignment: `splits` maps label →
    * integer percent (must sum to 100). A row's label is determined
    * solely by its key's hash bucket in [0,100), so membership is
    * stable under reruns, engines and data layout, and rows with equal
    * keys always land in the same split (the property that prevents
    * test-set leakage between duplicate documents).
    *
    * NULL keys get a NULL label (not a silent slot in the last split) —
    * a null-keyed row has no stable identity to assign; coalesce keys
    * first if they should participate. Implemented as ONE hash + a
    * 100-entry array lookup, not a when-chain: Catalyst's subexpression
    * elimination does not reach through conditional when-chains, which
    * would re-evaluate the md5 pipeline once per split. */
  def splitLabel(key: Column, splits: Seq[(String, Int)]): Column = {
    validateSplits(splits)
    // element_at is 1-based; NULL bucket (null key) → NULL label
    element_at(typedlit(bucketLabels(splits)), (hashBucket(key, 100) + 1).cast("int"))
  }

  /** DuckDB CASE expression equal to [[splitLabel]], NULL-key → NULL
    * included. (The oracle's per-branch bucket recomputation is
    * semantically identical; single-evaluation only matters Spark-side.) */
  def splitLabelSql(keyExpr: String, splits: Seq[(String, Int)]): String = {
    validateSplits(splits)
    val bucket = hashBucketSql(keyExpr, 100)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val whens = splits.zip(cuts).init
      .map { case ((label, _), upper) => s"WHEN $bucket < $upper THEN '$label'" }
    (s"CASE WHEN $keyExpr IS NULL THEN NULL ${whens.mkString(" ")} " +
      s"ELSE '${splits.last._1}' END")
  }

  /** Deterministic Bernoulli sample: keeps a row iff its key hashes
    * under `permille`/1000. The scalable replacement for
    * `df.sample(f)`: no RNG, no partitioning sensitivity, and the SAME
    * rows are kept on every engine and every run — so a 10‰ debug
    * sample drawn next month overlaps this month's exactly, and a
    * smaller rate's sample is a subset of a larger's. NULL keys are
    * never sampled (predicate is false, not null, for them). */
  def hashSamplePredicate(key: Column, permille: Int): Column = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    coalesce(hashBucket(key, 1000) < permille, lit(false))
  }

  def hashSamplePredicateSql(keyExpr: String, permille: Int): String =
    s"coalesce(${hashBucketSql(keyExpr, 1000)} < $permille, false)"
}
