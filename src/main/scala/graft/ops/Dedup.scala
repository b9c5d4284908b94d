package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Kernels}

/** Deduplication operators for large-scale text corpora — the extension
  * tier beyond the reference's own surface (the reference's only dedup is
  * keyed row_number, workfile_design_data_warehouse.sql:265–266; these add
  * the content-addressed and near-duplicate variants an LLM-data pipeline
  * needs).
  *
  * Scale posture (100 TB): every operator here is either row-local
  * (minhash/simhash signatures are computed per row with higher-order
  * array expressions — zero shuffle, no explode of the token stream) or
  * an equi-join on a bounded blocking/bucket key (LSH band join). There
  * are no cross joins and no driver-side collects; candidate volume is
  * controlled by the band/blocking parameters, not the corpus size.
  *
  * Evaluation-cost rule used throughout (this is load-bearing): Spark
  * evaluates higher-order-function lambdas interpreted, with NO common-
  * subexpression elimination — an array-valued EXPRESSION referenced
  * inside a lambda body is recomputed once per element. So every
  * intermediate array (tokens, shingles, per-token hashes) is first
  * materialized as a projection output and only ever referenced as an
  * attribute afterwards; each staged step is then O(array) per row
  * instead of O(array²).
  */
object Dedup {

  /** (doc_id, toks) table of de-duplicated whitespace word tokens.
    * `toks` is SORTED-distinct — the invariant the merge-intersect kernel
    * relies on (see [[jaccardPairs]]). */
  def tokenized(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), array_sort(array_distinct(split(lower(text), " "))).as("toks"))

  /** (doc_id, toks) table of word n-gram shingle sets (sorted-distinct).
    * Shingles (not unigram tokens) are what near-dup detection must hash:
    * unigram sets from a bounded vocabulary make almost every document
    * pair look similar, while shingle overlap decays fast unless passages
    * genuinely repeat. Shingle assembly is a native codegen'd kernel
    * (graft.functions.WordShingles) — this projection sits under every
    * join side of the pair generators and is re-evaluated per side, so
    * its constant factor matters. */
  def shingled(df: DataFrame, id: Column, text: Column, n: Int = 3,
               keep: Seq[Column] = Nil): DataFrame =
    df.select(id.as("doc_id") +:
      GraftFunctions.wordShingles(split(lower(text), " "), n).as("toks") +: keep: _*)

  // ------------------------------------------------------------- exact

  /** Exact content dedup: hash-groupBy on a normalized text digest, keep
    * the smallest id per digest plus the duplicate count. One shuffle on
    * the digest; at 100 TB this is the standard first pass (hash is 128
    * bits → collisions negligible, and grouping on the digest rather
    * than the text keeps shuffle rows tiny). */
  def exactDedup(df: DataFrame, id: Column, text: Column): DataFrame = {
    val digest = md5(lower(trim(text)))
    df.select(id.as("doc_id"), digest.as("text_digest"))
      .groupBy(col("text_digest"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
  }

  /** Collapse exact duplicates to one representative row per distinct
    * (normalized) text: smallest doc_id wins, copy count kept. One
    * map-side-combinable shuffle on the digest.
    *
    * This is the load-bearing FIRST stage of near-dup dedup at scale:
    * web-scale corpora are heavily exact-duplicated, and every pair
    * generator downstream is quadratic in the size of a duplicate group
    * (10 identical copies of a doc = 45 identical candidate pairs).
    * Collapsing first makes all downstream near-dup work scale with
    * DISTINCT documents — measured on a 10×-duplicated stress corpus,
    * pair generation over representatives runs at 1× cost while the
    * uncollapsed form pays ~20×.
    *
    * @param keep extra columns carried from the representative (min-id)
    *             row, e.g. blocking metadata for a downstream pair join
    */
  def collapseExact(df: DataFrame, id: Column, text: Column,
                    keep: Seq[Column] = Nil): DataFrame = {
    val proj = df.select(id.as("doc_id") +: text.as("text") +: keep: _*)
    val outNames = proj.columns
    proj.groupBy(md5(lower(trim(col("text")))).as("__dig"))
      .agg(min_by(struct(outNames.map(col): _*), col("doc_id")).as("__r"),
        count(lit(1)).as("n_copies"))
      .select(outNames.map(n => col(s"__r.$n").as(n)) :+ col("n_copies"): _*)
  }

  /** Benchmark decontamination: drop every training row whose
    * normalized text digest appears in `eval` — the step that keeps
    * eval/benchmark content out of a training corpus even when the
    * duplicated copies carry different ids or metadata.
    *
    * Content-level (digest) matching, not key-level: the leak to
    * prevent is the same TEXT arriving through a different source.
    * LEFT ANTI join on the 128-bit digest: eval digests are one narrow
    * column, the join shuffles digests rather than documents, and AQE
    * broadcasts the eval side when it fits. Pair with
    * [[graft.ops.Sampling.splitLabel]] for the split itself — its
    * same-key-same-split guarantee handles exact-duplicate KEYS, this
    * handles duplicate CONTENT across keys. Near-dup-level
    * decontamination = run [[minhashLshPairs]] between the sets
    * instead. */
  def decontaminate(train: DataFrame, trainText: Column,
                    eval: DataFrame, evalText: Column): DataFrame = {
    val dig = Names.fresh("contam_digest", train.columns)
    val evalDigests = eval.select(md5(lower(trim(evalText))).as(dig)).distinct()
    train.withColumn(dig, md5(lower(trim(trainText))))
      .join(evalDigests, Seq(dig), "left_anti")
      .drop(dig)
  }

  /** Bloom-prefiltered decontamination — the 100 TB shape of
    * [[decontaminate]]. The plain anti-join must move EVERY training
    * digest through a shuffle (or at minimum probe a broadcast hash
    * map built from all eval digests); here a Bloom filter over the
    * eval digests is evaluated map-side first, rows it rules out
    * (the overwhelming majority of a clean corpus) bypass the join
    * entirely, and only might-contain rows — true hits plus the
    * filter's false positives — reach the exact anti-join that
    * removes the false positives. Output is therefore IDENTICAL to
    * [[decontaminate]] at any filter size (a saturated bloom only
    * means more candidates, never a wrong row), which keeps the SQL
    * oracle the plain anti-join.
    *
    * Built on Spark's own `BloomFilterAggregate` /
    * `BloomFilterMightContain` (the runtime-filter machinery; not in
    * the public function registry, hence the ColumnBridge). The
    * built filter is one bounded binary scalar — ~1.2 bytes/item at
    * the default 3% fpp — collected to the driver and inlined as a
    * literal, the same discipline runtime filters use via scalar
    * subquery and [[Similarity.kmeansFit]] uses for centroids;
    * benchmark suites are eval-sized, not corpus-sized, so this
    * never collects unbounded data. */
  def decontaminateBloom(train: DataFrame, trainText: Column,
                         eval: DataFrame, evalText: Column,
                         expectedItems: Long = 1L << 16): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    val dig = Names.fresh("contam_digest", train.columns)
    val evalDigests = eval.select(md5(lower(trim(evalText))).as(dig)).distinct()
    val bloomBytes = evalDigests
      .agg(ColumnBridge.column(
        new BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(col(dig))), expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val marked = train.withColumn(dig, md5(lower(trim(trainText))))
    if (bloomBytes == null) return marked.drop(dig) // empty eval set: nothing to remove
    val might = ColumnBridge.column(new BloomFilterMightContain(
      Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col(dig)))))
    // definitely-clean rows skip the join; candidates get the exact check
    marked.filter(!might)
      .unionByName(marked.filter(might).join(evalDigests, Seq(dig), "left_anti"))
      .drop(dig)
  }

  /** N-gram-overlap contamination report (the GPT-3/PaLM-style eval-
    * contamination method): for each training doc, the number of
    * DISTINCT word n-grams it shares with the eval corpus — docs with
    * zero hits are omitted. [[decontaminate]]'s whole-text digest only
    * catches verbatim copies; sharing any single n-gram (n=13 is the
    * published choice) catches eval questions quoted inside larger
    * pages.
    *
    * Scale shape: both sides explode to (doc, gram-digest) rows —
    * per-row, map-side — and meet in ONE equi-join on the 128-bit gram
    * digest (joining digests, not gram text, keeps shuffle rows small
    * and fixed-width). Eval sets are benchmark-sized, so AQE broadcasts
    * that side in practice; the plan stays correct as a shuffle join if
    * an eval corpus outgrows the broadcast threshold. The gram explode
    * is ~|tokens| rows per doc — the same working set every shingle op
    * here already carries. */
  def contaminationNgramReport(train: DataFrame, trainId: Column, trainText: Column,
                               eval: DataFrame, evalText: Column,
                               n: Int = 13): DataFrame = {
    def grams(text: Column) =
      GraftFunctions.wordShingles(split(lower(text), " "), n)
    val evalGrams = eval
      .select(explode(grams(evalText)).as("__g"))
      .select(md5(col("__g")).as("__gd")).distinct()
    val trainGrams = train
      .select(trainId.as("doc_id"), explode(grams(trainText)).as("__g"))
      .select(col("doc_id"), md5(col("__g")).as("__gd"))
    trainGrams.join(evalGrams, "__gd")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Drop from `train` every doc sharing at least one word n-gram with
    * the eval corpus (see [[contaminationNgramReport]]); docs too short
    * to have an n-gram are never contaminated. Anti-join on the doc id
    * against the (small) contaminated-id set. */
  def decontaminateNgram(train: DataFrame, trainId: Column, trainText: Column,
                         eval: DataFrame, evalText: Column,
                         n: Int = 13): DataFrame = {
    val k = Names.fresh("contam_id", train.columns)
    val contaminated = contaminationNgramReport(train, trainId, trainText, eval, evalText, n)
      .select(col("doc_id").as(k))
    train.join(contaminated, trainId === col(k), "left_anti")
  }

  // ---------------------------------------------------- n-gram Jaccard

  /** Exact within-block Jaccard near-duplicate pairs over a
    * (doc_id, toks) table (see [[tokenized]]/[[shingled]]) — result =
    * ALL pairs with J ≥ minJaccard inside a block; candidate generation
    * uses PPJoin-style prefix filtering, which is lossless.
    *
    * Candidate generation: a pair with J(A,B) ≥ t must share at least
    * one token within the first |X| − ⌈t·|X|⌉ + 1 elements of each
    * SORTED set X (prefix-filtering principle, Chaudhuri et al. SSJoin
    * '06 / Xiao et al. PPJoin '08) — so candidates come from an
    * equi-join on (block, prefix-token) instead of all block pairs:
    * the array-carrying join shrinks from O(block²) to near the true
    * match count. Then the threshold-implied size filter
    * (min|A|,|B| ≥ t·max) and one merge-intersect per surviving pair.
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|) on integer sizes — the double
    * division is bit-stable across engines.
    *
    * @param block blocking key over the (doc_id, toks) row, e.g. a
    *              metadata join back or a cheap function of doc_id
    */
  def jaccardPairs(docs: DataFrame, block: Column, minJaccard: Double): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("toks"), block.as("blk"))
      .filter(size(col("toks")) > 0)
    // prefix length for sorted-set prefix filtering: |X| - ceil(t|X|) + 1
    val prefLen = (size(col("toks"))
      - ceil(lit(minJaccard) * size(col("toks"))).cast("int") + 1)
    val prefixes = keyed.select(col("blk"), col("doc_id"),
        explode(slice(col("toks"), lit(1), prefLen)).as("ptok"))
    val cands = prefixes.as("x").join(prefixes.as("y"), Seq("blk", "ptok"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(keyed.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), "doc_a")
      .join(keyed.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), "doc_b")
      // size filter implied by the threshold: J(A,B) <= min/max sizes
      .filter(least(size(col("toks_a")), size(col("toks_b"))).cast("double")
        >= lit(minJaccard) * greatest(size(col("toks_a")), size(col("toks_b"))).cast("double"))
      .select(col("doc_a"), col("doc_b"),
        GraftFunctions.sortedIntersectCount(col("toks_a"), col("toks_b")).as("__i"),
        (size(col("toks_a")) + size(col("toks_b"))).as("__t"))
      .select(col("doc_a"), col("doc_b"),
        round(col("__i").cast("double") / (col("__t") - col("__i")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** ASYMMETRIC near-dup: ordered pairs (a → b) with containment
    * C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ `minC` —
    * the RefinedWeb-style signal Jaccard misses: a short document
    * quoted verbatim inside a much longer one has high containment but
    * low Jaccard (the length mismatch drowns the symmetric measure).
    * For the same reason the block key must NOT include a length
    * bucket — cross-length pairs are the point.
    *
    * Candidate generation is prefix-filtered on the PROBE side only
    * (pigeonhole: if a shares ≥ ⌈minC·|a|⌉ shingles with b, then ANY
    * fixed subset of |a| − ⌈minC·|a|⌉ + 1 of a's shingles contains a
    * shared one — lossless for any subset choice), while the corpus
    * side indexes every shingle; the join is a plain equi-join on
    * (block, shingle), so candidate volume tracks genuinely shared
    * shingles, never block-pair cross products. Verification is one
    * sorted-set intersect per deduped ordered pair. */
  def containmentPairs(docs: DataFrame, block: Column,
                       minC: Double): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("toks"), block.as("blk"))
      .filter(size(col("toks")) > 0)
    val prefLen = (size(col("toks"))
      - ceil(lit(minC) * size(col("toks"))).cast("int") + 1)
    val probe = keyed.select(col("blk"), col("doc_id").as("doc_a"),
      explode(slice(col("toks"), lit(1), prefLen)).as("ptok"))
    val corpus = keyed.select(col("blk"), col("doc_id").as("doc_b"),
      explode(col("toks")).as("ptok"))
    val cands = probe.join(corpus, Seq("blk", "ptok"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cands
      .join(keyed.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), "doc_a")
      .join(keyed.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(GraftFunctions.sortedIntersectCount(col("toks_a"), col("toks_b"))
          .cast("double") / size(col("toks_a")).cast("double"), 6)
          .as("containment"))
      .filter(col("containment") >= minC)
  }

  // ------------------------------------------------------------ MinHash

  /** Per-row MinHash signature: for seed i, min over tokens of h_i(token)
    * (native codegen'd kernel — see graft.functions.MinHashSig; the
    * higher-order-function formulation evaluates interpreted and is an
    * order of magnitude slower). Row-local, no shuffle. Returns
    * array<long> of length `numHashes`. */
  def minhashSignature(toks: Column, numHashes: Int): Column =
    GraftFunctions.minhashSig(toks, numHashes)

  /** LSH banding of a materialized signature attribute: `bands` keys,
    * each hashing `rowsPerBand` consecutive signature components (plus
    * the band index, so buckets never collide across bands). Returns
    * array<struct<band:int, key:long>> for exploding into the band join. */
  def lshBands(sigAttr: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(sigAttr, b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(parts :+ lit(b): _*).as("key"))
    }: _*)

  /** MinHash+LSH near-duplicate candidate pairs over a (doc_id, toks)
    * table, verified.
    *
    * Pipeline: per-row signature → band keys → explode bands →
    * self-equi-join on (band, key) → distinct candidate pairs → estimate
    * similarity as the fraction of matching signature components, and
    * verify with exact Jaccard (two hash joins back to the token sets).
    * The only shuffles are the band join and the two verify joins, all
    * on keys — the classic shape that survives 1000 executors.
    *
    * Defaults 16 bands × 4 rows ≈ s-curve threshold (1/16)^(1/4) ≈ 0.5.
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                      minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sigs = docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        minhashSignature(col("toks"), numHashes).as("sig"))
    val banded = sigs.select(col("doc_id"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val withSig = cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("toks").as("toks_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("toks").as("toks_b")), "doc_b")
    val matching = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b))
    withSig.select(
        col("doc_a"), col("doc_b"),
        round(matching.cast("double") / numHashes, 6).as("est_jaccard"),
        size(array_intersect(col("toks_a"), col("toks_b"))).as("__i"),
        (size(col("toks_a")) + size(col("toks_b"))).as("__t"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(col("__i").cast("double") / (col("__t") - col("__i")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // ------------------------------------- md5-family (oracle-checkable)

  /** md5-family MinHash+LSH near-dup pairs: the same pipeline as
    * [[minhashLshPairs]] — row-local signatures, one band equi-join,
    * id-keyed verify joins — but every hash derives from md5
    * (graft.functions.Kernels.md5MinhashSig) and band keys are the RAW
    * r-tuples of signature components rather than a hash of them. Both
    * choices exist so a second engine can REPLAY the whole pipeline:
    * signatures, banding, the exact candidate set and the verified pair
    * list are all recomputable in portable SQL ([[minhashLshPairsMd5Sql]]
    * emits the DuckDB form the driver oracle runs). The xxhash64 variant
    * stays the throughput path; scale shape is identical. */
  def minhashLshPairsMd5(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                         minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sigs = docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        GraftFunctions.md5MinhashSig(col("toks"), numHashes).as("sig"))
    val keyCols = (0 until rowsPerBand).map(r => s"k$r")
    val banded = sigs.select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band") +:
            (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1).as(s"k$r")): _*)
        }: _*)).as("bk"))
      .select(col("doc_id") +: col("bk.band").as("band") +:
        keyCols.map(k => col(s"bk.$k").as(k)): _*)
    val cands = banded.as("x").join(banded.as("y"), "band" +: keyCols)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val withSig = cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("toks").as("toks_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("toks").as("toks_b")), "doc_b")
    val matching = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b))
    withSig.select(
        col("doc_a"), col("doc_b"),
        round(matching.cast("double") / numHashes, 6).as("est_jaccard"),
        GraftFunctions.sortedIntersectCount(col("toks_a"), col("toks_b")).as("__i"),
        (size(col("toks_a")) + size(col("toks_b"))).as("__t"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(col("__i").cast("double") / (col("__t") - col("__i")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** INCREMENTAL (append-batch) minhash-LSH dedup — the daily-crawl
    * production shape: a new batch dedups against the existing corpus
    * AND itself WITHOUT re-scoring corpus-internal pairs. Only rows
    * with `isNew` probe the band index; the index side is everything.
    * Candidate volume scales with the BATCH's band collisions, not the
    * corpus's — on a corpus that dwarfs its daily increment this is
    * the difference between re-running the full dedup and touching the
    * delta. Output equals [[minhashLshPairsMd5]] restricted to pairs
    * with ≥ 1 new side (same bands, same verify), which is what the
    * oracle replays. */
  def minhashLshIncrementalMd5(allDocs: DataFrame, isNew: Column,
                               numHashes: Int = 64, bands: Int = 16,
                               minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sigs = allDocs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"), isNew.as("__new"),
        GraftFunctions.md5MinhashSig(col("toks"), numHashes).as("sig"))
    val keyCols = (0 until rowsPerBand).map(r => s"k$r")
    val banded = sigs.select(col("doc_id"), col("__new"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band") +:
            (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1).as(s"k$r")): _*)
        }: _*)).as("bk"))
      .select(col("doc_id") +: col("__new") +: col("bk.band").as("band") +:
        keyCols.map(k => col(s"bk.$k").as(k)): _*)
    val probe = banded.filter(col("__new")).drop("__new")
    val cands = probe.as("x")
      .join(banded.drop("__new").as("y"), "band" +: keyCols)
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val withSig = cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
        col("toks").as("toks_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
        col("toks").as("toks_b")), "doc_b")
    val matching = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      b => b))
    withSig.select(
        col("doc_a"), col("doc_b"),
        round(matching.cast("double") / numHashes, 6).as("est_jaccard"),
        GraftFunctions.sortedIntersectCount(col("toks_a"), col("toks_b")).as("__i"),
        (size(col("toks_a")) + size(col("toks_b"))).as("__t"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(col("__i").cast("double") / (col("__t") - col("__i")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** md5-family SimHash near-dup pairs over 60-bit signatures
    * (graft.functions.Kernels.md5Simhash60): blocking on 15-bit chunks —
    * pigeonhole-lossless for maxHamming ≤ 3 over 4 chunks, same as the
    * 64-bit variant's 16-bit chunks. Because the blocking is lossless,
    * the oracle does not need to replay it: the output set equals the
    * brute-force Hamming filter [[simhashPairsMd5Sql]] computes. */
  def simhashPairsMd5(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "15-bit chunk blocking is lossless only for maxHamming <= 3")
    val sims = docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), GraftFunctions.md5Simhash60(col("toks")).as("sim"))
    val chunked = sims.select(col("doc_id"), col("sim"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sim"), c * 15).bitwiseAND(lit(0x7fffL)).as("key"))): _*)).as("ck"))
      .select(col("doc_id"), col("sim"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    chunked.as("x").join(chunked.as("y"), Seq("chunk", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB fragment: first 60 bits of md5(`expr`) as BIGINT — a nibble
    * parse of the first 15 hex chars, numerically equal to
    * graft.functions.Kernels.md5Hash60. */
  def md5Hash60Sql(expr: String): String =
    s"""CAST(list_sum([ (CAST(strpos('0123456789abcdef', (md5($expr))[i]) AS BIGINT) - 1)
          << (4 * (15 - i)) for i in range(1, 16) ]) AS BIGINT)"""

  /** DuckDB CTE chain producing the 3-word-shingle table
    * `$out(doc_id, shingles)` from a `(doc_id, text)` source —
    * the SQL mirror of [[shingled]] (distinctness matters; order does
    * not: every consumer is min/intersect/len). */
  def shinglesSqlCte(srcCte: String, out: String): String =
    s"""$out AS (
      SELECT doc_id,
        list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in range(1, len(toks) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM $srcCte))"""

  /** Full DuckDB query replaying [[minhashLshPairsMd5]] over a
    * `(doc_id, shingles)` CTE: rebuilds every signature with the same
    * rotate-xor seed family (constants emitted as literals from the same
    * Scala source the kernel uses), re-bands, re-joins, re-verifies. */
  def minhashLshPairsMd5Sql(docsCte: String, numHashes: Int = 64, bands: Int = 16,
                            minJaccard: Double = 0.5): String = {
    val rowsPerBand = numHashes / bands
    val params = (0 until numHashes).map(i =>
      s"{'r': ${Kernels.rotOf(i)}, 'c': CAST(${Kernels.constOf(i)} AS BIGINT)}")
      .mkString("[", ", ", "]")
    val rotXor = """xor(CASE WHEN p.r = 0 THEN x
             ELSE (x >> p.r) | ((x & ((CAST(1 AS BIGINT) << p.r) - 1)) << (60 - p.r)) END,
           p.c)"""
    s"""mh_hb AS (
      SELECT doc_id, shingles,
        list_transform(shingles, s -> ${md5Hash60Sql("s")}) AS hb
      FROM $docsCte WHERE len(shingles) > 0),
    mh_sigs AS (
      SELECT doc_id, shingles,
        list_transform($params,
          p -> list_min(list_transform(hb, x -> $rotXor))) AS sig
      FROM mh_hb),
    mh_banded AS (
      SELECT doc_id, b.band,
        array_to_string(sig[$rowsPerBand*b.band+1 : $rowsPerBand*b.band+$rowsPerBand], ',') AS key
      FROM mh_sigs, (SELECT unnest(range(0, $bands)) AS band) b),
    mh_cands AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM mh_banded x JOIN mh_banded y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b, est_jaccard, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
        ROUND(CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END
                             for i in range(1, $numHashes + 1)]) AS DOUBLE)
          / CAST($numHashes AS DOUBLE), 6) AS est_jaccard,
        ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / CAST(len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE), 6) AS jaccard
      FROM mh_cands c
      JOIN mh_sigs a ON c.doc_a = a.doc_id
      JOIN mh_sigs b ON c.doc_b = b.doc_id)
    WHERE jaccard >= $minJaccard"""
  }

  /** Full DuckDB query replaying [[simhashPairsMd5]] over a
    * `(doc_id, shingles)` CTE — brute-force Hamming filter (the 15-bit
    * chunk blocking is lossless, so replaying it would be redundant). */
  def simhashPairsMd5Sql(docsCte: String, maxHamming: Int = 3): String =
    s"""sh_hb AS (
      SELECT doc_id,
        list_transform(shingles, s -> ${md5Hash60Sql("s")}) AS hb
      FROM $docsCte WHERE len(shingles) > 0),
    sh_sims AS (
      SELECT doc_id,
        CAST(list_sum([CASE WHEN list_sum([CAST(2 * ((x >> i) & 1) - 1 AS BIGINT)
                                           for x in hb]) > 0
                       THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END
                       for i in range(0, 60)]) AS BIGINT) AS sim
      FROM sh_hb)
    SELECT doc_a, doc_b, hamming FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
      FROM sh_sims a JOIN sh_sims b ON a.doc_id < b.doc_id)
    WHERE hamming <= $maxHamming"""

  // ------------------------------------------------- connected components

  /** Connected components over a near-duplicate PAIR list — the step
    * that turns pairwise matches into dedup decisions: every document
    * in a component keeps/loses together, with `cluster_id` = the
    * component's smallest doc id as the canonical representative.
    *
    * HYBRID execution, picked by measured edge count. The pair list is
    * already the heavily-filtered output of blocking/LSH — usually
    * orders of magnitude smaller than the corpus — and Spark's
    * per-round fixed cost (job scheduling + shuffle + cache commit)
    * dwarfs the actual work on small graphs (measured ~1s/round on a
    * 25-edge list):
    *
    *   - edge count ≤ `localEdgeThreshold` and long node ids → exact
    *     union-find (path compression, union-by-min-root so the root IS
    *     the component min) inside ONE task via `mapPartitions` — one
    *     job total. 2^20 edges ≈ tens of MB of hash map, comfortably
    *     one-task-sized.
    *   - otherwise → iterative min-label propagation WITH POINTER
    *     JUMPING in DataFrames: each round every node first takes the
    *     min of its own and its neighbors' labels (one hop), then
    *     shortcuts through its label's own label (label values are
    *     node ids, so `label(label(n))` composes paths — the classic
    *     doubling step). Covered distance ~doubles per round, so
    *     rounds = O(log diameter), not O(diameter): replica-built
    *     near-dup corpora keep diameter shallow, but one long chain of
    *     pairwise matches in real data would otherwise pay a
    *     diameter-bound round count (ConnectedComponentsSpec pins a
    *     512-node chain converging in ≤ 12 rounds). Cost per round is
    *     two shuffles (the label aggregate + the jump join, whose
    *     aggregate exchange AQE reuses) and one bounded action —
    *     change detection rides the label aggregate; the driver holds
    *     only the changed-row flag, never the labels. Labels are
    *     localCheckpoint'ed per round: the jump join references the
    *     round's aggregate twice, so without truncation the logical
    *     plan would double every round.
    *
    * Output: (node, cluster_id), one row per node APPEARING IN PAIRS —
    * singleton documents never enter the pair list; left-join the
    * corpus to this and coalesce to its own id for full coverage.
    *
    * @throws IllegalStateException if the iterative path does not
    *         converge within maxIter (with doubling, the default 25
    *         rounds covers any diameter below ~2^25)
    */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 25,
                          localEdgeThreshold: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .cache()
    val isLongKeyed =
      edges.schema("src").dataType == org.apache.spark.sql.types.LongType
    if (isLongKeyed && edges.count() <= localEdgeThreshold) {
      val out = localUnionFind(edges)
      // release the cache now rather than leak it for the session; the
      // one recompute of a <= threshold edge list when `out` is
      // evaluated costs less than permanently-pinned executor memory
      edges.unpersist()
      return out
    }
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = edges.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("cluster_id"))
      // change detection rides the SAME aggregate that computes the new
      // labels: the node's old label is tagged into the union and
      // re-extracted per group (a join-based old-vs-new compare would
      // double the per-round job count)
      val prop = viaNeighbor.withColumn("is_old", lit(false))
        .union(labels.withColumn("is_old", lit(true)))
        .groupBy(col("node"))
        .agg(min(col("cluster_id")).as("mid"),
          min(when(col("is_old"), col("cluster_id"))).as("old_id"))
      // pointer jumping: label values are node ids, so shortcut each
      // node through its label's own label — covered distance ~doubles
      // per round (min labels only decrease, so label(mid) <= mid and
      // the left join + coalesce preserves monotonicity). Renamed copy,
      // not prop.as(...): self-join ambiguity silently binds both sides
      // to one relation (see the verify-skill gotcha); the aggregate
      // exchange under both sides is AQE-reused.
      val jump = prop.select(col("node").as("jnode"), col("mid").as("jlabel"))
      val next = prop.join(jump, col("mid") === col("jnode"), "left")
        .select(col("node"),
          coalesce(col("jlabel"), col("mid")).as("cluster_id"),
          col("old_id"))
        .localCheckpoint() // materialize + truncate: jump references prop twice
      converged = next.filter(col("cluster_id") =!= col("old_id")).isEmpty
      labels = next.select(col("node"), col("cluster_id"))
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    labels
  }

  /** Single-task exact union-find over a bounded (src, dst) long edge
    * list. Union by min root, so every root is its component's minimum
    * id — the same canonical representative the iterative path yields
    * (equality on random graphs proven in ConnectedComponentsSpec). */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.as[(Long, Long)].rdd.coalesce(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      it.foreach { case (s, d) =>
        parent.getOrElseUpdate(s, s)
        parent.getOrElseUpdate(d, d)
        val (rs, rd) = (find(s), find(d))
        if (rs != rd) {
          if (rs < rd) parent(rd) = rs else parent(rs) = rd
        }
      }
      // snapshot keys first: find() path-compresses (mutates) the map,
      // which must not interleave with a live HashMap iterator
      val ks = parent.keys.toArray
      ks.iterator.map(k => (k, find(k)))
    }.toDF("node", "cluster_id")
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash over a (doc_id, toks) table: bit i of the signature
    * is the sign of Σ_tokens (2·bit_i(hash(token)) − 1). Native codegen'd
    * kernel (graft.functions.SimHash64) — one pass over the tokens per
    * row, zero shuffle. Returns (doc_id, sim). */
  def simhashed(docs: DataFrame): DataFrame =
    docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), GraftFunctions.simhash64(col("toks")).as("sim"))

  /** SimHash near-duplicate pairs within Hamming distance `maxHamming`.
    *
    * Candidate generation blocks on 16-bit chunks of the signature: any
    * pair within Hamming distance ≤ 3 must agree on at least one of the
    * 4 chunks (pigeonhole), so a 4-way chunk equi-join has perfect recall
    * for maxHamming ≤ 3 — again joins on bounded keys, no cross join. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sims = simhashed(docs)
    val chunked = sims.select(col("doc_id"), col("sim"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("ck"))
      .select(col("doc_id"), col("sim"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    chunked.as("x").join(chunked.as("y"), Seq("chunk", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -------------------------------------------- duplicated passages

  /** (doc_id, pos, gd) — every positional whitespace-token `gram`-gram
    * of each document, digested with md5 (engine-portable). One row per
    * token position; docs shorter than `gram` tokens emit nothing.
    * Shared stage of [[dupPassages]] and [[gramNovelty]]. */
  def positionalGrams(df: DataFrame, id: Column, text: Column,
                      gram: Int): DataFrame = {
    // stage the token array first (see the evaluation-cost rule above)
    val tk = df.select(id.as("doc_id"), split(lower(text), " ").as("t"))
      .filter(size(col("t")) >= gram)
    // one compiled pass per doc (Kernels.posGramMd5) — the
    // transform(sequence, md5 ∘ concat_ws ∘ slice) lambda form it
    // replaces ran interpreted with per-position slice/concat
    // allocations; digests are byte-identical (DedupSpec pins both)
    tk.select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.posGramMd5(col("t"), gram)))
      .select(col("doc_id"), col("pos"), col("col").as("gd"))
  }

  /** The original lambda-pipeline formulation of [[positionalGrams]]'s
    * digest array — kept as the executable cross-check the spec pins
    * the kernel against. */
  private[graft] def posGramMd5Composed(t: Column, gram: Int): Column =
    transform(sequence(lit(1), size(t) - (gram - 1)),
      i => md5(concat_ws(" ", slice(t, i, lit(gram))).cast("binary")))

  /** Exact duplicated-PASSAGE detection between document pairs — the
    * substring-level dedup signal (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): two documents that
    * share a verbatim run of ≥ `minRun + gram − 1` tokens are flagged
    * with the length and count of their shared passages, which document-
    * level near-dup (Jaccard/MinHash) misses entirely when the passage
    * is a small fraction of each document (a quoted paragraph, a
    * boilerplate header, a copied license block).
    *
    * Seed-and-extend, fully relational: positional token `gram`-grams
    * are digested (md5 — engine-portable, so a SQL engine replays every
    * stage); digests are FREQUENCY-CAPPED (total occurrences ≤ `maxOcc`
    * and ≥ 2 distinct docs — the stop-gram guard that bounds the
    * self-join fanout the way real substring-dedup systems drop
    * super-frequent seeds); the surviving seed matches self-join on the
    * digest; and a shared passage appears as a run of consecutive
    * positions on one DIAGONAL (pos_a − pos_b constant) of a pair's
    * match matrix — classic gaps-and-islands per (pair, diagonal), one
    * window over fine-grained partitions. A run of r grams = r+gram−1
    * shared tokens.
    *
    * Scale shape: gram explode is O(total tokens) with combinable
    * frequency aggregation; the join is equi on the digest with fanout
    * ≤ maxOcc²/4 per digest BY CONSTRUCTION; islands window partitions
    * by (doc_a, doc_b, diag) — millions of tiny partitions, no skew
    * magnet; no cross join, nothing collected.
    *
    * Output: one row per document pair sharing ≥ 1 passage of ≥ minRun
    * grams — (doc_a, doc_b, n_passages, max_run_grams, max_span_tokens,
    * dup_grams). */
  def dupPassages(df: DataFrame, id: Column, text: Column,
                  gram: Int = 8, minRun: Int = 3, maxOcc: Int = 16): DataFrame = {
    require(gram >= 2, s"need gram >= 2, got $gram")
    require(minRun >= 1, s"need minRun >= 1, got $minRun")
    require(maxOcc >= 2, s"need maxOcc >= 2, got $maxOcc")
    // pg feeds the seed aggregate AND both self-join sides: materialize
    // the corpus-wide md5 explode once (the multi-consumer gotcha —
    // ReusedExchange does not span separate join sides)
    val pg = positionalGrams(df, id, text, gram).localCheckpoint(true)
    // seed filter: shared (>= 2 docs) but not boilerplate (<= maxOcc
    // occurrences total) — one combinable aggregate, semi-joined back
    val seeds = pg.groupBy(col("gd"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2 && col("n_occ") <= maxOcc)
      .select(col("gd"))
    val hits = pg.join(seeds, Seq("gd"), "left_semi")
    val pairs = hits.select(col("gd"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      .join(hits.select(col("gd"), col("doc_id").as("doc_b"), col("pos").as("pos_b")),
        Seq("gd"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"),
        (col("pos_a") - col("pos_b")).as("diag"))
    // islands: within a diagonal pos_a values are unique (pos_b is
    // determined), so pos_a - row_number is constant exactly on runs
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    val runs = pairs
      .withColumn("isl", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .filter(col("run") >= minRun)
    runs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_passages"),
        max(col("run")).as("max_run_grams"),
        (max(col("run")) + lit(gram - 1)).as("max_span_tokens"),
        sum(col("run")).as("dup_grams"))
  }

  /** DuckDB CTE chain replaying [[dupPassages]] bit-for-bit over
    * `srcCte` (columns doc_id, text); final CTE `__dp_out` has the
    * operator's six output columns. */
  def dupPassagesSql(srcCte: String, gram: Int = 8, minRun: Int = 3,
                     maxOcc: Int = 16): String = {
    s"""__dp_tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM $srcCte),
    __dp_pg AS (
      SELECT doc_id, u.p AS pos, u.g AS gd FROM (
        SELECT doc_id,
          unnest([{'p': i, 'g': md5(array_to_string(t[i:i+${gram - 1}], ' '))}
                  for i in range(1, len(t) - ${gram - 2})]) AS u
        FROM __dp_tk WHERE len(t) >= $gram)),
    __dp_seeds AS (
      SELECT gd FROM __dp_pg
      GROUP BY 1
      HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= $maxOcc),
    __dp_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
        a.pos - b.pos AS diag
      FROM __dp_pg a JOIN __dp_seeds USING (gd) JOIN __dp_pg b USING (gd)
      WHERE a.doc_id < b.doc_id),
    __dp_runs AS (
      SELECT doc_a, doc_b, diag, isl, COUNT(*) AS run FROM (
        SELECT doc_a, doc_b, diag, pos_a,
          pos_a - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                     ORDER BY pos_a) AS isl
        FROM __dp_pairs)
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= $minRun),
    __dp_out AS (
      SELECT doc_a, doc_b, COUNT(*) AS n_passages,
        MAX(run) AS max_run_grams,
        MAX(run) + ${gram - 1} AS max_span_tokens,
        CAST(SUM(run) AS BIGINT) AS dup_grams
      FROM __dp_runs GROUP BY 1, 2)"""
  }

  /** WITHIN-document repeated passages — the intra-doc repetition
    * signal (a looping template, a chorus, a copy-pasted paragraph
    * inside one page) that Gopher's aggregate repetition FRACTIONS
    * detect but cannot localize: the same diagonal machinery as
    * [[dupPassages]] applied to a document's self-matches. A gram
    * occurring at positions p and q (p < q) of the SAME doc seeds a
    * match at shift `period = q − p`; a run of ≥ minRun consecutive
    * seeds on one (doc, period) diagonal is a repeated passage of
    * `run + gram − 1` tokens recurring at that period.
    *
    * Seeds are grams occurring ≥ 2 times in the SAME document (not
    * ≥ 2 docs), still capped at ≤ `maxOcc` total occurrences per doc —
    * a doc chanting one token m times would otherwise self-pair
    * O(m²)/2. Output: one row per (doc, period) family after
    * aggregation — (doc_id, n_passages, max_run_grams, max_span_tokens,
    * dup_grams, min_period) with min_period the smallest shift among
    * the doc's maximal runs. */
  def selfRepeatPassages(df: DataFrame, id: Column, text: Column,
                         gram: Int = 8, minRun: Int = 3,
                         maxOcc: Int = 16): DataFrame = {
    require(gram >= 2, s"need gram >= 2, got $gram")
    require(minRun >= 1, s"need minRun >= 1, got $minRun")
    require(maxOcc >= 2, s"need maxOcc >= 2, got $maxOcc")
    // multi-consumer (seed aggregate + both self-join sides)
    val pg = positionalGrams(df, id, text, gram).localCheckpoint(true)
    val seeds = pg.groupBy(col("doc_id"), col("gd"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2 && col("n_occ") <= maxOcc)
      .select(col("doc_id"), col("gd"))
    val hits = pg.join(seeds, Seq("doc_id", "gd"), "left_semi")
    val pairs = hits.select(col("doc_id"), col("gd"), col("pos").as("pos_a"))
      .join(hits.select(col("doc_id"), col("gd"), col("pos").as("pos_b")),
        Seq("doc_id", "gd"))
      .filter(col("pos_a") < col("pos_b"))
      .select(col("doc_id"), col("pos_a"),
        (col("pos_b") - col("pos_a")).as("period"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"), col("period"))
      .orderBy(col("pos_a"))
    val runs = pairs
      .withColumn("isl", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_id"), col("period"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .filter(col("run") >= minRun)
    // min_period = smallest shift among the doc's MAXIMAL runs: tag the
    // per-doc max via a window over the tiny runs frame, then aggregate
    val runsM = runs.withColumn("doc_max",
      max(col("run")).over(Window.partitionBy(col("doc_id"))))
    runsM.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        max(col("run")).as("max_run_grams"),
        (max(col("run")) + lit(gram - 1)).as("max_span_tokens"),
        sum(col("run")).as("dup_grams"),
        min(when(col("run") === col("doc_max"), col("period")))
          .as("min_period"))
  }

  /** DuckDB CTE chain replaying [[selfRepeatPassages]] over `srcCte`
    * (columns doc_id, text); final CTE `__sr_out`. */
  def selfRepeatPassagesSql(srcCte: String, gram: Int = 8, minRun: Int = 3,
                            maxOcc: Int = 16): String = {
    s"""__sr_tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM $srcCte),
    __sr_pg AS (
      SELECT doc_id, u.p AS pos, u.g AS gd FROM (
        SELECT doc_id,
          unnest([{'p': i, 'g': md5(array_to_string(t[i:i+${gram - 1}], ' '))}
                  for i in range(1, len(t) - ${gram - 2})]) AS u
        FROM __sr_tk WHERE len(t) >= $gram)),
    __sr_seeds AS (
      SELECT doc_id, gd FROM __sr_pg
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2 AND COUNT(*) <= $maxOcc),
    __sr_pairs AS (
      SELECT a.doc_id, a.pos AS pos_a, b.pos - a.pos AS period
      FROM __sr_pg a JOIN __sr_seeds USING (doc_id, gd)
      JOIN __sr_pg b USING (doc_id, gd)
      WHERE a.pos < b.pos),
    __sr_runs AS (
      SELECT doc_id, period, isl, COUNT(*) AS run FROM (
        SELECT doc_id, period, pos_a,
          pos_a - ROW_NUMBER() OVER (PARTITION BY doc_id, period
                                     ORDER BY pos_a) AS isl
        FROM __sr_pairs)
      GROUP BY 1, 2, 3
      HAVING COUNT(*) >= $minRun),
    __sr_out AS (
      SELECT doc_id, COUNT(*) AS n_passages,
        MAX(run) AS max_run_grams,
        MAX(run) + ${gram - 1} AS max_span_tokens,
        CAST(SUM(run) AS BIGINT) AS dup_grams,
        CAST(MIN(CASE WHEN run = doc_max THEN period END) AS INTEGER)
          AS min_period
      FROM (
        SELECT *, MAX(run) OVER (PARTITION BY doc_id) AS doc_max
        FROM __sr_runs)
      GROUP BY 1)"""
  }

  /** Per-document n-gram NOVELTY — the memorization/boilerplate metric
    * corpus audits run before training (what fraction of this document
    * is verbatim present elsewhere in the corpus?): over positional
    * `gram`-grams, `shared_grams` counts positions whose gram occurs in
    * ≥ 2 distinct documents and `novel_frac = 1 − shared/total`. A doc
    * quoting one paragraph scores high novelty; a mirror page scores
    * ~0. Unlike [[dupPassages]] this is per-document (no pair join):
    * one explode, one combinable doc-frequency aggregate, one gd-keyed
    * equi-join back, one per-doc aggregate — scan-linear, no fanout,
    * needs no occurrence cap. Docs shorter than `gram` tokens emit
    * nothing. */
  def gramNovelty(df: DataFrame, id: Column, text: Column,
                  gram: Int = 8): DataFrame = {
    require(gram >= 2, s"need gram >= 2, got $gram")
    // two consumers (frequency aggregate + join back): materialize once
    val pg = positionalGrams(df, id, text, gram).localCheckpoint(true)
    val freq = pg.groupBy(col("gd"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    pg.join(freq, Seq("gd"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("nd") >= 2, 1)).as("shared_grams"))
      .withColumn("novel_frac",
        lit(1.0d) - col("shared_grams").cast("double")
          / col("n_grams").cast("double"))
  }

  /** DuckDB CTE chain replaying [[gramNovelty]] over `srcCte`
    * (columns doc_id, text); final CTE `__gn_out`. */
  def gramNoveltySql(srcCte: String, gram: Int = 8): String = {
    s"""__gn_tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM $srcCte),
    __gn_pg AS (
      SELECT doc_id, u AS gd FROM (
        SELECT doc_id,
          unnest([md5(array_to_string(t[i:i+${gram - 1}], ' '))
                  for i in range(1, len(t) - ${gram - 2})]) AS u
        FROM __gn_tk WHERE len(t) >= $gram)),
    __gn_freq AS (
      SELECT gd, COUNT(DISTINCT doc_id) AS nd FROM __gn_pg GROUP BY 1),
    __gn_out AS (
      SELECT doc_id, COUNT(*) AS n_grams,
        COUNT(CASE WHEN nd >= 2 THEN 1 END) AS shared_grams,
        CAST(1 AS DOUBLE)
          - CAST(COUNT(CASE WHEN nd >= 2 THEN 1 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS novel_frac
      FROM __gn_pg JOIN __gn_freq USING (gd)
      GROUP BY 1)"""
  }

  /** ExactSubstr-style duplicated-span COVERAGE per document — the
    * per-doc deliverable of suffix-array substring dedup (Lee et al.
    * 2022 build a corpus suffix array to find every substring of
    * length ≥ L that occurs more than once, then trim those byte
    * ranges): for each document, how many of its tokens sit inside a
    * ≥ `gram`-token span that occurs at least `minOcc` times anywhere
    * in the corpus (other docs or elsewhere in the same doc)?
    *
    * The suffix-array data structure is replaced by the equivalent
    * relational identity: a token at index i is inside a repeated
    * substring of length ≥ gram  ⇔  some positional gram-gram covering
    * i repeats — so the covered set is exactly the INTERVAL UNION of
    * [p, p+gram) over repeated-gram positions p. Seeds need no
    * occurrence cap (unlike [[dupPassages]]) because there is no pair
    * join: a boilerplate gram occurring a million times contributes
    * one frequency row and its own positions, nothing quadratic.
    *
    * Plan: one positional-gram explode (O(total tokens)), one
    * combinable frequency aggregate, one semi-join back on the digest,
    * then gaps-and-islands interval union per doc — running
    * max-of-ends over a PARTITION BY doc_id window (fine-grained
    * partitions bounded by doc length, no skew magnet), a break flag,
    * a running sum for the island id, and per-island min/max. Fully
    * scan-linear however duplicated the corpus is — the property that
    * makes this shape viable at 100 TB where an actual suffix array
    * over the concatenated corpus is a single-machine structure.
    *
    * Output: one row per non-empty doc — (doc_id, n_tokens,
    * dup_tokens, n_spans, dup_frac). dup_frac is an integer-derived
    * double division (bit-stable across engines). Docs shorter than
    * `gram` tokens have dup_tokens = 0 by construction. */
  def exactSubstrCoverage(df: DataFrame, id: Column, text: Column,
                          gram: Int = 8, minOcc: Int = 2): DataFrame = {
    require(gram >= 2, s"need gram >= 2, got $gram")
    require(minOcc >= 2, s"need minOcc >= 2, got $minOcc")
    import org.apache.spark.sql.expressions.Window
    // the gram frame feeds the frequency aggregate AND the join back:
    // materialize the md5 explode once (multi-consumer rule)
    val pg = positionalGrams(df, id, text, gram).localCheckpoint(true)
    val seeds = pg.groupBy(col("gd"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
      .select(col("gd"))
    val hits = pg.join(seeds, Seq("gd"), "left_semi")
      .select(col("doc_id"), col("pos"), (col("pos") + gram).as("end"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      // positions are unique within a doc (one gram per position), so
      // the pos order is total and the running max is deterministic
      .withColumn("pme", max(col("end")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pme").isNull || col("pos") > col("pme"), 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg((max(col("end")) - min(col("pos"))).as("span_len"))
      .groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    df.select(id.as("doc_id"),
        size(split(lower(text), " ")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .withColumn("dup_frac",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** DuckDB CTE chain replaying [[exactSubstrCoverage]] over `srcCte`
    * (columns doc_id, text); final CTE `__sc_out`. The 1-based DuckDB
    * gram positions are a uniform +1 shift of Spark's 0-based ones —
    * interval-union lengths are shift-invariant, so the outputs agree
    * bit-for-bit. */
  def exactSubstrCoverageSql(srcCte: String, gram: Int = 8,
                             minOcc: Int = 2): String = {
    s"""__sc_tk AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM $srcCte),
    __sc_pg AS (
      SELECT doc_id, u.p AS pos, u.g AS gd FROM (
        SELECT doc_id,
          unnest([{'p': i, 'g': md5(array_to_string(t[i:i+${gram - 1}], ' '))}
                  for i in range(1, len(t) - ${gram - 2})]) AS u
        FROM __sc_tk WHERE len(t) >= $gram)),
    __sc_seeds AS (
      SELECT gd FROM __sc_pg GROUP BY 1 HAVING COUNT(*) >= $minOcc),
    __sc_hits AS (
      SELECT doc_id, pos, pos + $gram AS "end"
      FROM __sc_pg SEMI JOIN __sc_seeds USING (gd)),
    __sc_isl AS (
      SELECT doc_id, pos, "end",
        SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
          OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM (
        SELECT doc_id, pos, "end",
          MAX("end") OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM __sc_hits)),
    __sc_spans AS (
      SELECT doc_id, CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
        COUNT(*) AS n_spans
      FROM (
        SELECT doc_id, isl, MAX("end") - MIN(pos) AS span_len
        FROM __sc_isl GROUP BY 1, 2)
      GROUP BY 1),
    __sc_out AS (
      SELECT s.doc_id, CAST(len(string_split(lower(s.text), ' ')) AS BIGINT)
          AS n_tokens,
        COALESCE(p.dup_tokens, 0) AS dup_tokens,
        COALESCE(p.n_spans, 0) AS n_spans,
        CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
          / CAST(len(string_split(lower(s.text), ' ')) AS DOUBLE) AS dup_frac
      FROM $srcCte s LEFT JOIN __sc_spans p ON p.doc_id = s.doc_id)"""
  }

  /** EXACT longest-duplicated-substring spans via a distributed suffix
    * ordering — the suffix-array form of training-data dedup (Lee et
    * al. 2021), complementing the gram-digest APPROXIMATION in
    * dupPassages/x_dedup_dup_spans (which can only see duplication at
    * one fixed gram size; this measures the true span length).
    *
    * Construction is fixed-round PREFIX DOUBLING (Manber–Myers, the
    * pointer-jumping precedent): suffix ranks at depth 2^k are the
    * dense rank of the pair (rank_k\[pos], rank_k\[pos+2^k]). The
    * pair lookup is NOT a self-join: positions are dense within a
    * document, so rank_k\[pos+2^k] is lead(r, 2^k) over the per-doc
    * position order — one in-memory window per round over the
    * doc-partitioned rank table, zero exchanges. Only the densify
    * rounds range-shuffle (via [[Scale.globalDenseRankBy]] — no
    * single-task sort anywhere). Tokens are ranked by the first 60
    * bits of their md5 (a BIGINT key, engine-portable order,
    * UTF8-collation-free); any total order on the alphabet yields a
    * valid suffix array.
    *
    * The classic suffix-array fact this rides on: the maximum LCP over
    * ALL suffix pairs is attained by a pair ADJACENT in suffix order —
    * so adjacency (via one more global row number) plus a per-pair LCP
    * finds every locally-maximal duplicated span exactly, up to the
    * depth cap 2^(rounds+1)−1 tokens. The LCP itself is computed
    * DIRECTLY on the token arrays (two joins against the per-doc
    * token frame + one leading-equal-count expression), which is
    * bit-identical to the classic O(log n) rank-table descent under
    * the same depth cap (both touch O(cap) tokens per pair) while
    * costing 2 joins instead of 2·(rounds+1) — see the inline note.
    * End-of-document is handled by a −1 sentinel rank in the ORDER
    * construction (shorter suffix sorts first) and by clamping the
    * compared window to both suffixes' remaining lengths.
    *
    * Scale shape at 100 TB: rounds × (one exchange-free lead window)
    * + rounds/2 range shuffles — O(n log n) total, the published cost
    * of suffix-array construction; the LCP stage is 2 bounded
    * equi-joins on the ADJACENT-pair frame (n rows); output is
    * orderBy+limit = TakeOrderedAndProject. Only genuinely
    * multi-consumer frames are checkpointed (the doc-token arrays,
    * the densified rank tables, the suffix order).
    *
    * Output: the topN document pairs by longest shared substring —
    * (doc_a, doc_b, lss_tokens, pos_a, pos_b, n_suffix_pairs, rank);
    * the overlapping-suffix ladder (an L-token duplicate produces ~L
    * adjacent pairs) is collapsed per doc pair, positions give the
    * earliest occurrence of the maximal span, doc_a = doc_b marks a
    * within-document repetition (genuine duplicated text too). With
    * the default 6 rounds the LCP is exact to 127 tokens — past every
    * document in the synthetic corpus (max 100). */
  def suffixSpans(df: DataFrame, id: Column, text: Column,
                  rounds: Int = 6, minLcp: Int = 8,
                  topN: Int = 20,
                  bigCorpusThreshold: Long = 1L << 22): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"1..8 doubling rounds, got $rounds")
    require(minLcp >= 1 && topN >= 1, s"minLcp/topN must be positive")
    // Per-doc token arrays, hash-partitioned by doc and checkpointed
    // FIRST. Two reasons: (a) the raw documents table can arrive as a
    // handful of input splits (a few MB of parquet at test SF), so
    // without an up-front exchange every tokenize/hash stage runs on
    // that handful of tasks; (b) the frame has three consumers — the
    // exploded rank-0 input below and both sides of the final LCP
    // join (multi-consumer rule).
    val docToks = df.filter(text.isNotNull)
      .select(id.as("doc"), split(lower(text), " ").as("toks"))
      .repartition(col("doc"))
      .localCheckpoint(true)
    // token count from the materialized doc frame (one tiny agg; the
    // exploded form would re-run tokenization just to count it)
    val nTok = docToks
      .agg(coalesce(sum(size(col("toks"))), lit(0L)).cast("long"))
      .head.getLong(0)
    // SIZE-GATED materialization: every intermediate below that feeds
    // a range repartition is evaluated TWICE by it (bound sampling +
    // the shuffle). At test SF the per-job barrier floor dominates, so
    // skipping the checkpoint and paying the cheap recompute wins; at
    // 100x the recompute is a real second pass over the corpus and
    // materialization wins (the 100x step measured 192s -> the gated
    // form). Same results either way — purely a plan-shape knob.
    val bigCorpus = nTok > bigCorpusThreshold
    def gate(d: DataFrame): DataFrame =
      if (bigCorpus) d.localCheckpoint(true) else d
    val toks = gate(docToks
      .select(col("doc"), size(col("toks")).cast("long").as("dlen"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc"), col("dlen"), col("pos").cast("long").as("pos"),
        // first 60 bits of md5 as BIGINT, not the 32-char hex string:
        // the token key rides through every range shuffle, sort and
        // checkpoint of the construction, and an 8-byte long keeps
        // those 4x smaller + compares word-wise. Same order, same
        // equality (up to the md5-collision class both forms share);
        // the oracle applies the identical prefix cast.
        expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)")
          .as("tk")))
    // rank_0: dense rank of the token (by md5 — engine-portable order).
    // globalDenseRankBy is one range shuffle + a broadcast per call —
    // no distinct frame, no join back. Dense-round rank tables are
    // partitioned by doc before their checkpoint so the doubling
    // windows below never exchange.
    var cur = Scale.globalDenseRankBy(toks, Seq(col("tk")), parts = 0)
      .select(col("doc"), col("dlen"), col("pos"),
        col("dense_rn").as("r"))
      .repartition(col("doc"))
      .localCheckpoint(true)
    // Alternate SPARSE and DENSE rank composition. Doubling only needs
    // the rank key to preserve ORDER and EQUALITY, not to be dense —
    // so on odd rounds the pair (r, rb) is packed into one long
    // (r·B + rb + 1, order-preserving since both < B), a pure
    // projection with NO range shuffle; the pack overflows 63 bits if
    // composed twice, so every even round re-densifies. Halves the
    // densify passes (each is a range shuffle + checkpoint + window —
    // the dominant per-round cost). Downstream only tests EQUALITY of
    // rank entries, which both key forms preserve.
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(nTok + 2)
    require(2 * bits + 1 <= 63,
      s"suffix set $nTok too large for sparse pair packing — " +
        "densify every round instead")
    val packB = 1L << bits
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("pos"))
    // the depth-2^preK rank table doubles as the big-corpus LCP
    // PREFILTER below: rank equality at depth d ⟺ padded LCP ≥ d, so
    // with d ≤ minLcp the filter drops only pairs the minLcp filter
    // would drop anyway — before their token arrays ever move
    val preK = math.min(
      63 - java.lang.Long.numberOfLeadingZeros(math.max(minLcp, 1).toLong),
      rounds - 1).toInt
    var preTable: DataFrame = null
    for (k <- 1 to rounds) {
      val off = (1L << (k - 1)).toInt
      // rank at (doc, pos+2^(k-1)) = lead(r, 2^(k-1)) over the
      // per-doc pos order — pos is DENSE 0..dlen−1 by construction,
      // so the window's row offset IS the position offset. This is
      // the doubling "self-join" with no join at all: one in-memory
      // window over the doc-partitioned rank table (no exchange; and
      // chained windows share one sort — same partition+order spec).
      // NULL past end-of-doc is the −1 sentinel (shorter sorts first)
      val paired = cur.withColumn("rb",
        coalesce(lead(col("r"), off).over(wDoc), lit(-1L)))
      cur = if (k == rounds)
        // the FINAL round never needs a rank VALUE at all — only the
        // suffix ORDER below — and dense rank is order-isomorphic to
        // its key, so order by (r_final, doc, pos) ≡ order by
        // (r_prev, rb_prev, doc, pos). Keep both key columns and
        // skip the last densify's range shuffle entirely.
        gate(paired.select(col("doc"), col("dlen"), col("pos"),
          col("r"), col("rb")))
      else if (k % 2 == 1)
        // sparse round: a pure projection — at test SF not even
        // materialized (the next densify's range shuffle re-evaluates
        // the window chain from the last checkpoint, in-partition and
        // cheap, once for bound sampling, once for the shuffle); at
        // 100x the gate materializes it so the corpus-sized window
        // runs once
        gate(paired.select(col("doc"), col("dlen"), col("pos"),
          (col("r") * packB + col("rb") + 1).as("r")))
      else
        Scale.globalDenseRankBy(paired, Seq(col("r"), col("rb")),
            parts = 0)
          .select(col("doc"), col("dlen"), col("pos"),
            col("dense_rn").as("r"))
          .repartition(col("doc"))
          .localCheckpoint(true)
      if (k == preK && bigCorpus)
        preTable = cur // already materialized (gate / densify ckpt)
    }
    // global suffix order; (r[, rb], doc, pos) is a total order
    val orderKeys =
      if (cur.columns.contains("rb"))
        Seq(col("r"), col("rb"), col("doc"), col("pos"))
      else Seq(col("r"), col("doc"), col("pos"))
    // at test SF no outer checkpoint: globalRowNumberBy already
    // materializes the range-partitioned frame internally, and both
    // adjacency sides re-derive from it with one in-partition window
    // + broadcast — cheaper than another barrier. At 100x the gate
    // materializes so the corpus-sized numbering window runs once.
    val sa = gate(Scale.globalRowNumberBy(cur, orderKeys)
      .withColumnRenamed("global_rn", "srn"))
    val bAdj = sa.select((col("srn") - 1).as("srn"),
      col("doc").as("doc_b"), col("pos").as("pos_b"),
      col("dlen").as("dlen_b"))
    val pairs = sa.join(bAdj, Seq("srn"))
      .select(col("doc").as("doc_a"), col("pos").as("pos_a"),
        col("dlen").as("dlen_a"),
        col("doc_b"), col("pos_b"), col("dlen_b"))
    // LCP of each adjacent pair, computed DIRECTLY on the token
    // arrays: with the depth cap D = 2^(rounds+1)−1 tokens, the
    // classic O(log n) rank-table descent (2·(rounds+1) distributed
    // joins of the n-row pair frame — git history) and a direct
    // common-prefix count over ≤D tokens do identical per-pair work
    // (the descent's window walk also touches O(D) tokens' worth of
    // rank state), but the direct form needs only TWO joins against
    // the per-doc token arrays and one codegen-stage expression —
    // 12 fewer shuffles of the pair frame. Values are bit-identical:
    // counting leading equal tokens over min(rem_a, rem_b, D) equals
    // the descent's sentinel-padded walk after its end-of-doc clamp.
    // Memory bound: each pair row materializes its docs' arrays
    // in-stage (never shuffled — the slice+count collapses to a
    // scalar before the next exchange), so per-row cost is O(doc
    // length), the same bound the text column itself already carries.
    // docToks is the doc-partitioned checkpoint from the top.
    val ta = docToks.select(col("doc").as("__da"), col("toks").as("__ta"))
    val tb = docToks.select(col("doc").as("__db"), col("toks").as("__tb"))
    val depthCap = (1L << (rounds + 1)) - 1
    // big-corpus PREFILTER: the token-array joins are the one place
    // the per-doc arrays travel with the n-row pair frame, and in a
    // mostly-unduplicated corpus almost every adjacent pair fails the
    // minLcp bar anyway. Two NARROW joins against the kept depth-2^preK
    // rank table (long columns, table side doc-partitioned) keep only
    // pairs whose ranks match — padded LCP ≥ 2^preK — before any
    // array moves; dropped pairs have padded (hence clamped) LCP
    // < 2^preK ≤ minLcp, so the output is identical. (The 100× step
    // measured the unfiltered array joins at ~2× the whole r7 wall.)
    val cand = if (preTable != null) {
      val fa = preTable.select(col("doc").as("__fda"),
        col("pos").as("__fpa"), col("r").as("__fra"))
      val fb = preTable.select(col("doc").as("__fdb"),
        col("pos").as("__fpb"), col("r").as("__frb"))
      pairs
        .join(fa, col("doc_a") === col("__fda")
          && col("pos_a") === col("__fpa"))
        .join(fb, col("doc_b") === col("__fdb")
          && col("pos_b") === col("__fpb"))
        .filter(col("__fra") === col("__frb"))
        .drop("__fda", "__fpa", "__fra", "__fdb", "__fpb", "__frb")
    } else pairs
    val scored = cand
      .join(ta, col("doc_a") === col("__da"))
      .join(tb, col("doc_b") === col("__db"))
      .withColumn("__m", least(col("dlen_a") - col("pos_a"),
        col("dlen_b") - col("pos_b"), lit(depthCap)))
      // leading-equal count = position of the first mismatch in the
      // zipped equality mask, minus 1; no mismatch → the full window.
      // array_position is a native (non-lambda) scan (the one lambda
      // left is the trivial per-element x = y) and returns 0 — not
      // NULL — when nothing matches, hence the nullif gate.
      .withColumn("lcp_tokens", expr(
        """CAST(coalesce(
          |  nullif(array_position(
          |    zip_with(slice(__ta, CAST(pos_a + 1 AS INT), CAST(__m AS INT)),
          |             slice(__tb, CAST(pos_b + 1 AS INT), CAST(__m AS INT)),
          |             (x, y) -> x = y),
          |    false), 0) - 1,
          |  __m) AS BIGINT)""".stripMargin))
      .drop("__da", "__ta", "__db", "__tb", "__m")
      .filter(col("lcp_tokens") >= minLcp)
      // normalize occurrence order so one (doc pair) groups once
      // regardless of which suffix sorted first
      .withColumn("__sw", col("doc_a") > col("doc_b")
        || (col("doc_a") === col("doc_b") && col("pos_a") > col("pos_b")))
      .select(
        when(col("__sw"), col("doc_b")).otherwise(col("doc_a")).as("doc_a"),
        when(col("__sw"), col("pos_b")).otherwise(col("pos_a")).as("pos_a"),
        when(col("__sw"), col("doc_a")).otherwise(col("doc_b")).as("doc_b"),
        when(col("__sw"), col("pos_a")).otherwise(col("pos_b")).as("pos_b"),
        col("lcp_tokens"))
    // collapse the overlapping-suffix ladder (an L-token duplicate
    // yields ~L adjacent pairs) to the document-pair LSS: longest
    // shared substring + where it starts (earliest positions on ties)
    val out = scored
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(struct(col("lcp_tokens"),
          (-col("pos_a")).as("na"), (-col("pos_b")).as("nb"))).as("m"),
        count(lit(1)).as("n_suffix_pairs"))
      .select(col("doc_a"), col("doc_b"),
        col("m.lcp_tokens").as("lss_tokens"),
        (-col("m.na")).as("pos_a"), (-col("m.nb")).as("pos_b"),
        col("n_suffix_pairs"))
      .orderBy(col("lss_tokens").desc, col("doc_a"), col("doc_b"))
      .limit(topN) // TakeOrderedAndProject — no global sort
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lss_tokens").desc, col("doc_a"), col("doc_b"))
    out.withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Full DuckDB replay of [[suffixSpans]] over `srcCte` (columns
    * doc_id, text): unrolled prefix-doubling rounds (DENSE_RANK is
    * the windowed form of the range-partitioned distinct-rank), the
    * same md5 alphabet order, the same adjacency + LCP descent. */
  def suffixSpansSql(srcCte: String, rounds: Int = 6, minLcp: Int = 8,
                     topN: Int = 20): String = {
    val doubling = (1 to rounds).map { k =>
      val off = 1L << (k - 1)
      s"""__sa_r$k AS (
      SELECT a.doc, a.dlen, a.pos,
        CAST(DENSE_RANK() OVER (ORDER BY a.r, COALESCE(b.r, -1))
          AS BIGINT) AS r
      FROM __sa_r${k - 1} a
      LEFT JOIN __sa_r${k - 1} b ON b.doc = a.doc AND b.pos = a.pos + $off)"""
    }.mkString(",\n    ")
    val descent = (rounds to 0 by -1).zipWithIndex.map { case (k, i) =>
      s"""__sa_p${i + 1} AS (
      SELECT p.doc_a, p.pos_a, p.dlen_a, p.doc_b, p.pos_b, p.dlen_b,
        p.l + CASE WHEN ra.r = rb.r THEN ${1L << k} ELSE 0 END AS l
      FROM __sa_p$i p
      LEFT JOIN __sa_r$k ra
        ON ra.doc = p.doc_a AND ra.pos = p.pos_a + p.l
      LEFT JOIN __sa_r$k rb
        ON rb.doc = p.doc_b AND rb.pos = p.pos_b + p.l)"""
    }.mkString(",\n    ")
    s"""WITH __sa_toks AS (
      SELECT doc, CAST(len(t) AS BIGINT) AS dlen, CAST(u.i AS BIGINT) AS pos,
        CAST(('0x' || substring(md5(t[u.i + 1]), 1, 15)) AS BIGINT) AS tk
      FROM (SELECT doc_id AS doc, string_split(lower(text), ' ') AS t
            FROM $srcCte) d,
        unnest(range(0, len(t))) AS u(i)),
    __sa_r0 AS (
      SELECT doc, dlen, pos,
        CAST(DENSE_RANK() OVER (ORDER BY tk) AS BIGINT) AS r
      FROM __sa_toks),
    $doubling,
    __sa_sa AS (
      SELECT doc, dlen, pos, r,
        ROW_NUMBER() OVER (ORDER BY r, doc, pos) AS srn
      FROM __sa_r$rounds),
    __sa_p0 AS (
      SELECT a.doc AS doc_a, a.pos AS pos_a, a.dlen AS dlen_a,
        b.doc AS doc_b, b.pos AS pos_b, b.dlen AS dlen_b,
        CAST(0 AS BIGINT) AS l
      FROM __sa_sa a JOIN __sa_sa b ON b.srn = a.srn + 1),
    $descent,
    __sa_scored AS (
      SELECT
        CASE WHEN sw THEN doc_b ELSE doc_a END AS doc_a,
        CASE WHEN sw THEN pos_b ELSE pos_a END AS pos_a,
        CASE WHEN sw THEN doc_a ELSE doc_b END AS doc_b,
        CASE WHEN sw THEN pos_a ELSE pos_b END AS pos_b,
        lcp_tokens
      FROM (
        SELECT doc_a, pos_a, doc_b, pos_b,
          LEAST(l, dlen_a - pos_a, dlen_b - pos_b) AS lcp_tokens,
          (doc_a > doc_b OR (doc_a = doc_b AND pos_a > pos_b)) AS sw
        FROM __sa_p${rounds + 1}
        WHERE LEAST(l, dlen_a - pos_a, dlen_b - pos_b) >= $minLcp)),
    __sa_best AS (
      SELECT doc_a, doc_b, lcp_tokens AS lss_tokens, pos_a, pos_b,
        n_suffix_pairs
      FROM (
        SELECT doc_a, doc_b, lcp_tokens, pos_a, pos_b,
          CAST(COUNT(*) OVER (PARTITION BY doc_a, doc_b) AS BIGINT)
            AS n_suffix_pairs,
          ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b
            ORDER BY lcp_tokens DESC, pos_a, pos_b) AS rn
        FROM __sa_scored)
      WHERE rn = 1)
    SELECT doc_a, doc_b, lss_tokens, pos_a, pos_b, n_suffix_pairs,
      CAST(ROW_NUMBER() OVER (ORDER BY lss_tokens DESC, doc_a, doc_b)
        AS INTEGER) AS rank
    FROM __sa_best
    QUALIFY rank <= $topN"""
  }
}
