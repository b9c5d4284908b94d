package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}
import graft.ops.{AsofJoin, Dedup, Graph, Multimodal, Packing, Phonetic, RangeJoin, Sampling, Scale, Similarity, TextOps}
import graft.streaming.EventStream

/** Extension tier (BASELINE.json north star): the LLM-training-data
  * operators beyond the reference's own surface — dedup, similarity
  * search, text analysis, multimodal plumbing — over the `documents`,
  * `embeddings` and `events` testdata tables.
  *
  * Every query here carries a DuckDB oracle. Hash-based semantics
  * (minhash/simhash/fingerprints, seeded hyperplane LSH) are oracle'd by
  * REPLAY: the kernels run on md5 (computable in DuckDB), and the oracle
  * re-derives each emitted row's hashes/scores with list_transform/
  * list_reduce, so the pair sets and scores are value-checked while
  * RECALL (which SQL cannot measure) stays pinned by the ScalaTest specs
  * (DedupSpec, SimilaritySpec) against exact computations.
  */
object ExtensionQueries {

  // ------------------------------------------------------------- dedup

  /** Exact content dedup via normalized-text digest (hash-groupBy). */
  private val x_dedup_exact = Q(
    "x_dedup_exact",
    (s, d) => Dedup.exactDedup(
      Tables.documents(s, d).filter(col("text").isNotNull),
      col("doc_id"), col("text")),
    Some("""SELECT md5(lower(trim(text))) AS text_digest,
      min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1"""))

  /** ORACLE-CHECKED collapse composition: exact-duplicate collapse (with
    * blocking metadata carried from the representative row) feeding the
    * blocked exact-Jaccard pair generator. Same semantics computed
    * independently by DuckDB (arg_min collapse + brute-force block
    * pairs) — this is the correctness gate on the collapse-then-near-dup
    * pattern that x_dedup_pipeline runs with (non-oracle-able) MinHash. */
  private val x_dedup_jaccard_collapsed = Q(
    "x_dedup_jaccard_collapsed",
    (s, d) => {
      val reps = Dedup.collapseExact(
        Tables.documents(s, d)
          .filter(col("text").isNotNull && col("lang").isNotNull
            && col("n_chars").isNotNull
            && size(split(lower(col("text")), " ")) >= 3),
        col("doc_id"), col("text"),
        keep = Seq(col("lang"), (col("n_chars") / lit(50)).cast("long").as("lb")))
      Dedup.jaccardPairs(
        Dedup.shingled(reps, col("doc_id"), col("text"),
          keep = Seq(col("lang"), col("lb"))),
        block = struct(col("lang"), col("lb")),
        minJaccard = 0.5)
    },
    Some("""WITH base AS (
      SELECT doc_id, text, lang, CAST(n_chars // 50 AS BIGINT) AS lb
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
        AND len(string_split(lower(text), ' ')) >= 3),
    reps AS (
      SELECT arg_min(doc_id, doc_id) AS doc_id, arg_min(text, doc_id) AS text,
             arg_min(lang, doc_id) AS lang, arg_min(lb, doc_id) AS lb
      FROM base GROUP BY md5(lower(trim(text)))),
    docs AS (
      SELECT doc_id, lang, lb,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, len(toks) - 1)]) AS shingles
      FROM (SELECT *, string_split(lower(text), ' ') AS toks FROM reps)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / CAST(len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE),
          6) AS jaccard
      FROM docs a JOIN docs b
        ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.5"""))

  /** Production-shaped dedup pipeline: collapse exact duplicates FIRST
    * (one digest shuffle; smallest id is the representative), then
    * MinHash+LSH near-dup pairs over representatives only. On heavily-
    * duplicated corpora the uncollapsed pair generators are quadratic in
    * duplicate-group size; this form's candidate work scales with
    * DISTINCT documents (measured ~20× faster on a 10×-duplicated
    * stress corpus). md5-family variant, so the ORACLE REPLAYS BOTH
    * STAGES: DuckDB re-runs the arg_min collapse AND the full
    * signature/banding/verify chain over the representatives. */
  private val x_dedup_pipeline = Q(
    "x_dedup_pipeline",
    (s, d) => {
      val reps = Dedup.collapseExact(
        Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), col("text"))
      Dedup.minhashLshPairsMd5(Dedup.shingled(reps, col("doc_id"), col("text")))
    },
    Some(s"""WITH mh_reps AS (
      SELECT arg_min(doc_id, doc_id) AS doc_id, arg_min(text, doc_id) AS text
      FROM documents WHERE text IS NOT NULL
      GROUP BY md5(lower(trim(text)))),
    ${Dedup.shinglesSqlCte("mh_reps", "mh_docs")},
    ${Dedup.minhashLshPairsMd5Sql("mh_docs")}"""))

  /** Shared Spark side of the blocked exact-Jaccard pair generator —
    * also the edge list of [[x_dedup_clusters]]. lang/n_chars IS NOT
    * NULL on BOTH sides: Spark's struct-key join treats NULL fields as
    * equal while the oracle's a.lang = b.lang drops them — pin one
    * semantics so the engines cannot diverge. */
  private def jaccardPairsDf(s: org.apache.spark.sql.SparkSession, d: String) =
    Dedup.jaccardPairs(
      Dedup.shingled(
        Tables.documents(s, d)
          .filter(col("text").isNotNull && col("lang").isNotNull
            && col("n_chars").isNotNull
            && size(split(lower(col("text")), " ")) >= 3),
        col("doc_id"), col("text"),
        keep = Seq(col("lang"), (col("n_chars") / lit(50)).cast("long").as("lb"))),
      block = struct(col("lang"), col("lb")),
      minJaccard = 0.5)

  /** Shared oracle CTEs producing the same (doc_a, doc_b, jaccard)
    * pair list in DuckDB (thresholded at 0.5). */
  private val jaccardPairsSqlCtes = """docs AS (
      SELECT doc_id, lang, CAST(n_chars // 50 AS BIGINT) AS lb,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, len(toks) - 1)]) AS shingles
      FROM (SELECT *, string_split(lower(text), ' ') AS toks
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL)
      WHERE len(toks) >= 3),
    pairs AS (
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / CAST(len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE),
            6) AS jaccard
        FROM docs a JOIN docs b
          ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
      WHERE jaccard >= 0.5)"""

  /** Exact blocked shingle-Jaccard near-dup pairs (block = lang x length
    * bucket) — the oracle-checkable ground truth the LSH variants
    * approximate. 3-word shingle sets, not unigrams: with a bounded
    * vocabulary unigram sets make every pair look alike. */
  private val x_dedup_jaccard = Q(
    "x_dedup_jaccard",
    (s, d) => jaccardPairsDf(s, d),
    Some(s"""WITH $jaccardPairsSqlCtes
    SELECT doc_a, doc_b, jaccard FROM pairs"""))

  /** Near-dup CLUSTERS: connected components over the exact-Jaccard
    * pair list (Dedup.connectedComponents — iterative min-label
    * propagation, one equi-join + one min-aggregate per round).
    * Pairwise matches alone don't define a dedup decision; components
    * do — every member maps to the component's min doc_id as its
    * canonical representative. The oracle computes the same components
    * independently via a DuckDB RECURSIVE transitive closure. */
  private val x_dedup_clusters = Q(
    "x_dedup_clusters",
    (s, d) => Dedup.connectedComponents(jaccardPairsDf(s, d), "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("cluster_id")),
    Some(s"""WITH RECURSIVE $jaccardPairsSqlCtes,
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src"""))

  /** Cluster-size distribution over the near-dup components — the
    * dedup-QA histogram (a fat tail means a boilerplate family or a
    * broken blocking key; mass at size 1 means the corpus is mostly
    * unique): component sizes from [[Dedup.connectedComponents]],
    * bucketed, with the singleton count derived from documents not in
    * any pair. Output bounded by the number of DISTINCT sizes. */
  private val x_dedup_cluster_sizes = Q(
    "x_dedup_cluster_sizes",
    (s, d) => {
      val cc = Dedup.connectedComponents(jaccardPairsDf(s, d), "doc_a", "doc_b")
      val sized = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      val nDocs = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull
          && col("n_chars").isNotNull
          && size(split(lower(col("text")), " ")) >= 3)
        .agg(count(lit(1)).as("n_docs"))
      val nClustered = cc.agg(count(lit(1)).as("n_in"))
      val singletons = nDocs.crossJoin(nClustered)
        .select(lit(1L).as("cluster_size"),
          (col("n_docs") - col("n_in")).as("n_clusters"))
        .filter(col("n_clusters") > 0)
      sized.unionByName(singletons)
        .groupBy(col("cluster_size"))
        .agg(sum(col("n_clusters")).cast("long").as("n_clusters"))
    },
    Some(s"""WITH RECURSIVE $jaccardPairsSqlCtes,
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cc AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
           FROM reach GROUP BY src),
    sized AS (
      SELECT sz AS cluster_size, COUNT(*) AS n_clusters FROM (
        SELECT cluster_id, COUNT(*) AS sz FROM cc GROUP BY 1)
      GROUP BY 1),
    singles AS (
      SELECT CAST(1 AS BIGINT) AS cluster_size,
        (SELECT COUNT(*) FROM docs) - (SELECT COUNT(*) FROM cc) AS n_clusters)
    SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
    FROM (SELECT * FROM sized
          UNION ALL SELECT * FROM singles WHERE n_clusters > 0)
    GROUP BY 1"""))

  /** Survivorship: the dedup DECISION the cluster map exists for —
    * every document joins its near-dup cluster (singletons form their
    * own), and each cluster keeps its highest-quality member (quality
    * tie → smallest doc_id; quality bit-parity across engines is
    * already proven by x_text_stats). Top-1-per-cluster runs as
    * WindowGroupLimit, so the full corpus is never sorted. The oracle
    * recomputes clusters via the recursive closure AND re-derives the
    * same survivor choice. */
  private val x_dedup_survivors = Q(
    "x_dedup_survivors",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val member = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull
          && col("n_chars").isNotNull
          && size(split(lower(col("text")), " ")) >= 3)
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
        .join(
          Dedup.connectedComponents(jaccardPairsDf(s, d), "doc_a", "doc_b")
            .select(col("node").as("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val wc = Window.partitionBy(col("cluster_id"))
      member
        .withColumn("n_members", count(lit(1)).over(wc))
        .withColumn("rn", row_number().over(
          wc.orderBy(col("q").desc, col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_doc_id"),
          col("q").as("keep_quality"), col("n_members"))
    },
    Some(s"""WITH RECURSIVE $jaccardPairsSqlCtes,
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    clusters AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src),
    member AS (
      SELECT b.doc_id, COALESCE(c.cluster_id, b.doc_id) AS cluster_id,
        ${TextOps.qualityScoreSql("text")} AS q
      FROM (SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
              AND n_chars IS NOT NULL
              AND len(string_split(lower(text), ' ')) >= 3) b
      LEFT JOIN clusters c USING (doc_id))
    SELECT cluster_id, doc_id AS keep_doc_id, q AS keep_quality, n_members
    FROM (SELECT *,
        COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
        ROW_NUMBER() OVER (PARTITION BY cluster_id
          ORDER BY q DESC, doc_id) AS rn
      FROM member)
    WHERE rn = 1"""))

  /** MinHash + LSH band-join near-dup candidates, Jaccard-verified —
    * md5-family variant, so the ORACLE REPLAYS THE WHOLE PIPELINE:
    * DuckDB rebuilds every 64-component signature from the same
    * rotate-xor seed family, re-bands, re-derives the exact candidate
    * set and re-verifies each emitted pair's Jaccard. The xxhash64
    * variant (Dedup.minhashLshPairs) is the throughput path, spec-pinned
    * for recall in DedupSpec — same plan shape, cheaper hash. */
  private val x_dedup_minhash_lsh = Q(
    "x_dedup_minhash_lsh",
    (s, d) => Dedup.minhashLshPairsMd5(
      Dedup.shingled(Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), col("text"))),
    Some(s"""WITH ${Dedup.shinglesSqlCte(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)", "mh_docs")},
    ${Dedup.minhashLshPairsMd5Sql("mh_docs")}"""))

  /** Incremental append-batch dedup ([[Dedup.minhashLshIncrementalMd5]]):
    * the "new" 20% of documents (doc_id % 5 = 0) dedup against the
    * standing corpus and themselves; corpus-internal pairs are never
    * re-scored. The oracle runs the FULL LSH pair replay restricted to
    * ≥-one-new-side pairs — equal because the incremental probe uses
    * the same bands and the same verify. */
  private val x_dedup_incremental = Q(
    "x_dedup_incremental",
    (s, d) => Dedup.minhashLshIncrementalMd5(
      Dedup.shingled(Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), col("text")),
      isNew = col("doc_id") % 5 === 0),
    Some(s"""SELECT * FROM (
      WITH ${Dedup.shinglesSqlCte(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)", "mi_docs")},
      ${Dedup.minhashLshPairsMd5Sql("mi_docs")}
    ) t WHERE doc_a % 5 = 0 OR doc_b % 5 = 0"""))

  /** SimHash near-dup pairs within Hamming distance 3 — md5-family
    * 60-bit variant (15-bit chunk blocking, pigeonhole-lossless), so the
    * oracle brute-forces the same pair set: DuckDB rebuilds every
    * signature bit-by-bit and filters on recomputed Hamming distance.
    * The xxhash64 64-bit variant (Dedup.simhashPairs) stays the
    * throughput path. */
  private val x_dedup_simhash = Q(
    "x_dedup_simhash",
    (s, d) => Dedup.simhashPairsMd5(
      Dedup.shingled(Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), col("text"))),
    Some(s"""WITH ${Dedup.shinglesSqlCte(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)", "sh_docs")},
    ${Dedup.simhashPairsMd5Sql("sh_docs")}"""))

  // -------------------------------------------------------- similarity

  /** Brute-force exact cosine top-5 for a small query batch (vec_id<10)
    * against the full corpus — the ANN ground-truth baseline. Cosine is
    * rounded to 6dp BEFORE ranking (with id tiebreak) so the ordering is
    * robust to engine-level float summation differences. */
  private val x_sim_cosine_topk = Q(
    "x_sim_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some("""WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < 10),
    c AS (
      SELECT vec_id AS neighbor_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
        ROUND(list_inner_product(qv, cv)
          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))),
          6) AS cosine
      FROM c, q WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, cosine,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
        AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** Hyperplane-LSH bucketed ANN top-5 — the scale path (equi-join on
    * the sign-signature bucket instead of a full scan per query). The
    * seeded hyperplanes are plan literals, so the ORACLE REPLAYS THE
    * WHOLE INDEX: Similarity.lshTopKSql re-emits the identical plane
    * constants and DuckDB recomputes signatures, buckets, candidates and
    * ranking independently; recall vs brute force stays SimilaritySpec's
    * job. */
  private val x_sim_lsh_topk = Q(
    "x_sim_lsh_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some(Similarity.lshTopKSql("vec_id < 10", k = 5)))

  /** IVF-Flat bucketed ANN top-5 — the inverted-file scale path (argmax-
    * cosine cell assignment, nprobe-cell probing). Centroids are a
    * deterministic corpus sample CAPPED at nlist=128 (orderBy+limit =
    * TakeOrderedAndProject, no global sort): cell-assignment cost is
    * O(corpus × nlist), so nlist must stay bounded as the corpus grows —
    * an uncapped modulus sample made assignment quadratic-ish on a 10×
    * stress corpus. Every step is deterministic (modulus-sampled
    * centroids, 6dp-rounded argmax assignment, 6dp-rounded cosine rank),
    * so the ORACLE REPLAYS THE WHOLE INDEX: DuckDB rebuilds the cells,
    * probe lists and ranking independently; recall at nprobe<nlist and
    * brute-force equality at nprobe>=nlist stay SimilaritySpec's job. */
  private val x_sim_ivf_topk = Q(
    "x_sim_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        centroids = emb.filter(col("vec_id") % 97 === 0)
          .orderBy(col("vec_id")).limit(128),
        nprobe = 4)
    },
    Some("""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm
      FROM v WHERE sqrt(list_inner_product(v, v)) > 0),
    cent AS (
      -- centroid cap runs BEFORE the zero-norm drop, matching the Spark
      -- side (limit on the raw modulus sample, withVecNorm inside ivfTopK)
      SELECT cell_id, ev, en FROM (
        SELECT vec_id AS cell_id, v AS ev, sqrt(list_inner_product(v, v)) AS en
        FROM v WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 128)
      WHERE en > 0),
    cells AS (
      -- argmax-cosine cell per corpus vector; ties -> LARGER cell id
      -- (max_by on struct(sim, cell_id))
      SELECT vec_id AS neighbor_id, cell_id, cv, cn FROM (
        SELECT a.vec_id, ct.cell_id, a.v AS cv, a.nrm AS cn,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
            ORDER BY ROUND(list_inner_product(a.v, ct.ev) / (a.nrm * ct.en), 6) DESC,
                     ct.cell_id DESC) AS rn
        FROM n a CROSS JOIN cent ct)
      WHERE rn = 1),
    probes AS (
      -- top-nprobe closest cells per query; ties -> SMALLER cell id
      SELECT query_id, qv, qn, cell_id FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qn, ct.cell_id,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY ROUND(list_inner_product(q.v, ct.ev) / (q.nrm * ct.en), 6) DESC,
                     ct.cell_id) AS rn
        FROM (SELECT * FROM n WHERE vec_id < 10) q CROSS JOIN cent ct)
      WHERE rn <= 4),
    scored AS (
      SELECT query_id, neighbor_id,
        ROUND(list_inner_product(qv, cv) / (qn * cn), 6) AS cosine
      FROM cells JOIN probes USING (cell_id)
      WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, cosine,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
        AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** Graph-based ANN top-5 — fixed-round beam search over a bounded-
    * degree (m=12) neighbor graph with cross-cell bridge edges
    * (each node joins its top-2 cells during graph build), beam 24,
    * 4 rounds: the navigable-small-world family, completing the ANN
    * tier (LSH/IVF/PQ/IVF-PQ already present). Parameters sit at the
    * swept knee: within-cell-only edges (p=1) plateaued at recall
    * 0.56–0.82; p=2 bridges lift the same budget to 0.92 at 4× the
    * (cell-bounded) edge-join volume. Every phase is deterministic
    * (modulus-sampled centroid cells, 6dp-rounded cosines, id
    * tiebreaks, fixed rounds), so the ORACLE REPLAYS THE WHOLE INDEX:
    * Similarity.nswTopKSql re-derives cells, edges and the unrolled
    * beam rounds in DuckDB. Recall vs brute force is the companion
    * `x_sim_nsw_recall` row (and SimilaritySpec). */
  private val x_sim_nsw_topk = Q(
    "x_sim_nsw_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.nswTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        centroids = emb.filter(col("vec_id") % 97 === 0)
          .orderBy(col("vec_id")).limit(128),
        m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
    },
    Some(Similarity.nswTopKSql("vec_id < 10", k = 5,
      m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)))

  /** Recall@5 of the NSW beam search against the exact brute-force
    * top-5 — ONE summary row (n_truth, n_hits, recall_at_5), the
    * quality gate a production ANN rollout watches. Both pipelines are
    * fully SQL-replayable, so this is a real hash-checked oracle row,
    * not a spec-only measurement: DuckDB re-runs brute force AND the
    * whole NSW index and intersects independently. */
  private val x_sim_nsw_recall = Q(
    "x_sim_nsw_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val truth = Similarity
        .bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val got = Similarity.nswTopK(emb.filter(col("vec_id") < 10), emb,
          k = 5, centroids = emb.filter(col("vec_id") % 97 === 0)
            .orderBy(col("vec_id")).limit(128),
          m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      truth.join(got, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
        .select(col("n_truth"), col("n_hits"),
          round(col("n_hits").cast("double")
            / col("n_truth").cast("double"), 6).as("recall_at_5"))
    },
    Some(s"""WITH truth AS (
      WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 10),
      c AS (
        SELECT vec_id AS neighbor_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings),
      scored AS (
        SELECT query_id, neighbor_id,
          ROUND(list_inner_product(qv, cv)
            / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))), 6) AS cosine
        FROM c, q WHERE query_id <> neighbor_id)
      SELECT query_id, neighbor_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY rank <= 5),
    got AS (${Similarity.nswTopKSql("vec_id < 10", k = 5,
      m = 12, beamWidth = 24, rounds = 4, cellsPerNode = 2)})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
      CAST(COUNT(g.neighbor_id) AS BIGINT) AS n_hits,
      ROUND(CAST(COUNT(g.neighbor_id) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS recall_at_5
    FROM truth t LEFT JOIN got g
      ON t.query_id = g.query_id AND t.neighbor_id = g.neighbor_id"""))

  /** Hierarchical NSW top-5 (the HNSW shape — round-7 verdict ask #5):
    * one sparse upper layer (md5-56 modulus sample, 1/16 of the
    * corpus) with its own bounded-degree graph; search beams 2 rounds
    * over the upper layer from the sparser entry sample (∪ centroids),
    * then descends — the upper beam seeds 3 layer-0 rounds. Same edge
    * budget (m=12) and beam width (24) as `x_sim_nsw_topk`; the win is
    * better ENTRY points than fixed centroid seeds. Every phase is
    * deterministic, so Similarity.hnswTopKSql replays both layer
    * graphs and both beam descents in DuckDB. Recall companion:
    * `x_sim_hnsw_recall`. */
  private val x_sim_hnsw_topk = Q(
    "x_sim_hnsw_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hnswTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        centroids = emb.filter(col("vec_id") % 97 === 0)
          .orderBy(col("vec_id")).limit(128),
        m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
        cellsPerNode = 2, layerMod = 16, entryFactor = 8)
    },
    Some(Similarity.hnswTopKSql("vec_id < 10", k = 5,
      m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
      cellsPerNode = 2, layerMod = 16, entryFactor = 8)))

  /** Recall@5 of the hierarchical beam search against exact brute
    * force — one summary row, fully SQL-replayed on both sides (the
    * `x_sim_nsw_recall` contract). The acceptance bar from the
    * round-7 verdict: ≥ the flat NSW's recall at equal beam width. */
  private val x_sim_hnsw_recall = Q(
    "x_sim_hnsw_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val truth = Similarity
        .bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val got = Similarity.hnswTopK(emb.filter(col("vec_id") < 10), emb,
          k = 5, centroids = emb.filter(col("vec_id") % 97 === 0)
            .orderBy(col("vec_id")).limit(128),
          m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
          cellsPerNode = 2, layerMod = 16, entryFactor = 8)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      truth.join(got, Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
        .select(col("n_truth"), col("n_hits"),
          round(col("n_hits").cast("double")
            / col("n_truth").cast("double"), 6).as("recall_at_5"))
    },
    Some(s"""WITH truth AS (
      WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id < 10),
      c AS (
        SELECT vec_id AS neighbor_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings),
      scored AS (
        SELECT query_id, neighbor_id,
          ROUND(list_inner_product(qv, cv)
            / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))), 6) AS cosine
        FROM c, q WHERE query_id <> neighbor_id)
      SELECT query_id, neighbor_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY rank <= 5),
    got AS (${Similarity.hnswTopKSql("vec_id < 10", k = 5,
      m = 12, beamWidth = 24, upperRounds = 2, lowerRounds = 3,
      cellsPerNode = 2, layerMod = 16, entryFactor = 8)})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
      CAST(COUNT(g.neighbor_id) AS BIGINT) AS n_hits,
      ROUND(CAST(COUNT(g.neighbor_id) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS recall_at_5
    FROM truth t LEFT JOIN got g
      ON t.query_id = g.query_id AND t.neighbor_id = g.neighbor_id"""))

  /** One Lloyd k-means assignment step over the embeddings — the IVF
    * index trainer's inner loop (Similarity.kmeansAssign), oracle-
    * checked: DuckDB recomputes every corpus×centroid squared-L2 and
    * takes the same rounded-distance argmin. Centroids are a FIXED-SIZE
    * hash-rank top-128 pick (order by md5 of the id — a deterministic
    * pseudo-random spread over the id space — then limit, which Spark
    * plans as TakeOrderedAndProject: scan-linear, no global sort). The
    * cap matters at scale: an earlier modulus sample grew |centroids|
    * with the corpus, making this O(corpus²/97) — the 100× scale step
    * measured 56×. With k pinned at 128 the step is O(corpus × 128),
    * the same nlist discipline as [[Similarity.ivfTopK]]. Both engines
    * emit identical lowercase md5 hex, so DuckDB replays the pick. The
    * full iterative trainer (Similarity.kmeansFit) is proven in
    * SimilaritySpec (monotone within-cluster-variance descent + exact
    * recovery of planted clusters), since iteration count isn't
    * SQL-expressible. */
  private val x_kmeans_step = Q(
    "x_kmeans_step",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.kmeansAssign(
        emb,
        emb.filter(col("embedding").isNotNull)
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
          .limit(128)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec")),
        id = "vec_id", vec = "embedding")
    },
    Some("""WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (
      SELECT cid, cv FROM (
        SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE embedding IS NOT NULL
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 128)),
    dists AS (
      SELECT a.vec_id, ct.cid,
        ROUND(list_inner_product(a.v, a.v) + list_inner_product(ct.cv, ct.cv)
          - 2 * list_inner_product(a.v, ct.cv), 6) AS d2
      FROM c a CROSS JOIN cent ct)
    SELECT vec_id, cid, d2 FROM dists
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1"""))

  /** Embedding-cosine near-duplicate pairs — exact variant (tables=0)
    * over a bounded corpus slice so DuckDB can brute-force the oracle;
    * the LSH-bucketed variant of the same operator is the scale path
    * (Similarity.cosinePairs with tables>0, exercised in
    * SimilaritySpec). */
  private val x_dedup_embedding = Q(
    "x_dedup_embedding",
    (s, d) => Similarity.cosinePairs(
      Tables.embeddings(s, d).filter(col("vec_id") < 500),
      minCosine = 0.3, tables = 0),
    Some("""WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 500),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(list_inner_product(a.v, b.v)
          / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))),
          6) AS cosine
      FROM c a JOIN c b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.3"""))

  /** Int8 embedding quantization (native codegen'd kernel,
    * graft.functions.QuantizeInt8): symmetric max-abs scaling to
    * [-127, 127] — 4× storage compression for ANN indexes. Output is
    * exploded per element so DuckDB value-checks every quantized
    * component (floor(x·127/max|x| + 0.5) is exact double arithmetic in
    * both engines). */
  private val x_embed_quantize = Q(
    "x_embed_quantize",
    (s, d) => Tables.embeddings(s, d).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(graft.functions.GraftFunctions.quantizeInt8(col("embedding"))))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "q"),
    Some("""WITH t AS (
      -- coalesce(x, 0): NULL elements quantize to 0, matching the
      -- kernel's documented null handling (NaN is outside the oracle
      -- contract; testdata has none)
      SELECT vec_id, embedding AS e,
        list_max(list_transform(embedding,
          x -> abs(CAST(coalesce(x, 0) AS DOUBLE)))) AS m
      FROM embeddings WHERE embedding IS NOT NULL),
    q AS (
      SELECT vec_id,
        CASE WHEN m > 0 THEN list_transform(e,
               x -> CAST(floor(CAST(coalesce(x, 0) AS DOUBLE) * (127.0 / m) + 0.5) AS INTEGER))
             ELSE list_transform(e, x -> 0) END AS qv
      FROM t)
    SELECT vec_id,
      CAST(unnest(generate_series(1, len(qv))) - 1 AS INTEGER) AS dim,
      unnest(qv) AS q
    FROM q"""))

  /** Johnson-Lindenstrauss random projection 64→16 dims
    * ([[Similarity.randomProject]]): hash-derived Rademacher (±1) sign
    * matrix, broadcast once, applied map-side with ZERO corpus shuffle —
    * the dimensionality-reduction stage in front of ANN indexing (4×
    * fewer dot-product terms at a JL-bounded distance distortion, which
    * SimilaritySpec pins statistically). Arithmetic is exact integer
    * micros, so the oracle re-derives the ENTIRE projection — sign
    * matrix (same md5 formula via Sampling.hashValueSql) and every
    * order-free term sum — bit-for-bit. */
  private val x_embed_project = Q(
    "x_embed_project",
    (s, d) => Similarity.randomProject(
      Tables.embeddings(s, d), inDim = 64, outDim = 16),
    Some(s"""WITH signs AS (
      SELECT j, i,
        CASE WHEN ${Sampling.hashValueSql("'rp|' || j || '|' || i")} % 2 = 0
             THEN 1 ELSE -1 END AS s
      FROM range(16) tj(j), range(64) ti(i)),
    v AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vm
      FROM embeddings WHERE embedding IS NOT NULL),
    e AS (
      SELECT vec_id,
        CAST(unnest(generate_series(1, len(vm))) - 1 AS BIGINT) AS i,
        unnest(vm) AS xm
      FROM v)
    SELECT vec_id, CAST(s.j AS INTEGER) AS out_dim,
      CAST(SUM(e.xm * s.s) AS BIGINT) AS proj_micro
    FROM e JOIN signs s ON s.i = e.i
    GROUP BY vec_id, s.j"""))

  /** Brute-force cosine top-5 over int8-QUANTIZED embeddings — the
    * compressed-index search path (quantize once, search the 4×-smaller
    * vectors). Integer dot products are exact in double, so unlike raw
    * float cosine the whole scoring chain is oracle-exact: DuckDB
    * re-derives the quantization AND the ranking. Recall vs the float
    * ranking is a property of the data, not the engine — SimilaritySpec
    * covers it; this query pins the quantized semantics themselves. */
  private val x_sim_quantized_topk = Q(
    "x_sim_quantized_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.GraftFunctions.quantizeInt8(col("embedding")).as("embedding"))
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some("""WITH t AS (
      SELECT vec_id, embedding AS e,
        list_max(list_transform(embedding,
          x -> abs(CAST(coalesce(x, 0) AS DOUBLE)))) AS m
      FROM embeddings WHERE embedding IS NOT NULL),
    qz AS (
      SELECT vec_id,
        CASE WHEN m > 0 THEN list_transform(e,
               x -> CAST(floor(CAST(coalesce(x, 0) AS DOUBLE) * (127.0 / m) + 0.5) AS DOUBLE))
             ELSE list_transform(e, x -> CAST(0 AS DOUBLE)) END AS v
      FROM t),
    nz AS (
      SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS n
      FROM qz WHERE list_inner_product(v, v) > 0),
    qs AS (SELECT vec_id AS query_id, v AS qv, n AS qn FROM nz WHERE vec_id < 10),
    scored AS (
      SELECT query_id, c.vec_id AS neighbor_id,
        ROUND(list_inner_product(qv, c.v) / (qn * c.n), 6) AS cosine
      FROM nz c, qs WHERE query_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
        AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** Product-quantization ADC top-5 ([[Similarity.pqTopK]]): corpus
    * stored as 8 four-bit codes per 64-dim vector (64× compression),
    * queries scan codes against a per-query lookup table and sum
    * integer micro-distances. The oracle replays EVERYTHING — the
    * hash-rank codebook pick, every subspace argmin code, the LUT, and
    * the ranked ADC sums — so a drift anywhere in the encode/search
    * chain breaks the hash. Recall vs exact search is data-dependent
    * and spec-pinned (SimilaritySpec); this query pins the PQ
    * semantics. */
  private val x_sim_pq_adc = Q(
    "x_sim_pq_adc",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some("""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    cents AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS INTEGER) - 1 AS code, v AS cv
      FROM (SELECT * FROM v
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
    js AS (SELECT unnest(range(8)) AS j),
    centsub AS (
      SELECT code, j, list_slice(cv, j*8 + 1, j*8 + 8) AS csub,
        list_inner_product(list_slice(cv, j*8 + 1, j*8 + 8),
                           list_slice(cv, j*8 + 1, j*8 + 8)) AS cn
      FROM cents CROSS JOIN js),
    vsub AS (
      SELECT vec_id, j, list_slice(v, j*8 + 1, j*8 + 8) AS vs,
        list_inner_product(list_slice(v, j*8 + 1, j*8 + 8),
                           list_slice(v, j*8 + 1, j*8 + 8)) AS vn
      FROM v CROSS JOIN js),
    codes AS (
      SELECT vec_id AS neighbor_id, j, code FROM (
        SELECT a.vec_id, a.j, ct.code,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id, a.j
            ORDER BY ROUND(a.vn + ct.cn - 2 * list_inner_product(a.vs, ct.csub), 6),
                     ct.code) AS rn
        FROM vsub a JOIN centsub ct USING (j))
      WHERE rn = 1),
    lut AS (
      SELECT q.vec_id AS query_id, q.j, ct.code,
        CAST(ROUND((q.vn + ct.cn - 2 * list_inner_product(q.vs, ct.csub)) * 1e6)
          AS BIGINT) AS d2m
      FROM vsub q JOIN centsub ct USING (j) WHERE q.vec_id < 10),
    scored AS (
      SELECT query_id, neighbor_id, CAST(SUM(d2m) AS BIGINT) AS adc_micro
      FROM codes JOIN lut USING (j, code)
      WHERE query_id <> neighbor_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_micro,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY adc_micro, neighbor_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** PQ ADC top-5 with PER-SUBSPACE codebooks
    * ([[Similarity.pqTopKSubspace]]) — the real PQ posture: each
    * subspace quantizes independently (here an independent
    * md5(vec_id ":" j) hash-rank pick per subspace, the deterministic
    * stand-in for per-subspace k-means). The oracle replays the per-j
    * pick (ROW_NUMBER per subspace partition), every argmin code, the
    * LUT, and the ranked ADC sums. The pick's scale shape — partial
    * WindowGroupLimit before the exchange, so the window input is
    * bounded by partitions·codebookSize — is asserted in
    * SimilaritySpec. */
  private val x_sim_pq_subspace = Q(
    "x_sim_pq_subspace",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKSubspace(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some("""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    js AS (SELECT unnest(range(8)) AS j),
    pick AS (
      SELECT j, v AS cv,
        CAST(ROW_NUMBER() OVER (PARTITION BY j
          ORDER BY md5(CAST(vec_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                   vec_id) AS INTEGER) - 1 AS code
      FROM v CROSS JOIN js
      QUALIFY code < 16),
    centsub AS (
      SELECT code, j, list_slice(cv, j*8 + 1, j*8 + 8) AS csub,
        list_inner_product(list_slice(cv, j*8 + 1, j*8 + 8),
                           list_slice(cv, j*8 + 1, j*8 + 8)) AS cn
      FROM pick),
    vsub AS (
      SELECT vec_id, j, list_slice(v, j*8 + 1, j*8 + 8) AS vs,
        list_inner_product(list_slice(v, j*8 + 1, j*8 + 8),
                           list_slice(v, j*8 + 1, j*8 + 8)) AS vn
      FROM v CROSS JOIN js),
    codes AS (
      SELECT vec_id AS neighbor_id, j, code FROM (
        SELECT a.vec_id, a.j, ct.code,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id, a.j
            ORDER BY ROUND(a.vn + ct.cn - 2 * list_inner_product(a.vs, ct.csub), 6),
                     ct.code) AS rn
        FROM vsub a JOIN centsub ct USING (j))
      WHERE rn = 1),
    lut AS (
      SELECT q.vec_id AS query_id, q.j, ct.code,
        CAST(ROUND((q.vn + ct.cn - 2 * list_inner_product(q.vs, ct.csub)) * 1e6)
          AS BIGINT) AS d2m
      FROM vsub q JOIN centsub ct USING (j) WHERE q.vec_id < 10),
    scored AS (
      SELECT query_id, neighbor_id, CAST(SUM(d2m) AS BIGINT) AS adc_micro
      FROM codes JOIN lut USING (j, code)
      WHERE query_id <> neighbor_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_micro,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY adc_micro, neighbor_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** IVF-PQ residual-encoded ANN top-5 ([[Similarity.ivfPqTopK]],
    * nlist=8, nprobe=2) — the composed serving structure (coarse
    * inverted file routes, PQ quantizes the residual v − c(cell), the
    * query scans only probed cells' codes with a per-(query, cell)
    * LUT). The oracle independently replays the whole stack: the
    * hash-rank coarse pick, every rounded-argmin cell assignment, the
    * residual arrays, the per-subspace residual codebook pick, every
    * code, the probe lists, the LUT, and the ranked micro-ADC sums.
    * Recall vs exact search is the IVF trade, spec-pinned; this query
    * pins the composition's semantics. */
  private val x_sim_ivfpq = Q(
    "x_sim_ivfpq",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
    },
    Some("""WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vn
      FROM embeddings WHERE embedding IS NOT NULL),
    cents AS (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR) || ':ivf'), vec_id)
               AS INTEGER) - 1 AS cell,
        v AS cv, list_inner_product(v, v) AS cn
      FROM (SELECT * FROM v
            ORDER BY md5(CAST(vec_id AS VARCHAR) || ':ivf'), vec_id LIMIT 8)),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT a.vec_id, c.cell,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
            ORDER BY ROUND(a.vn + c.cn - 2 * list_inner_product(a.v, c.cv), 6),
                     c.cell) AS rn
        FROM v a CROSS JOIN cents c)
      WHERE rn = 1),
    res AS (
      SELECT a.vec_id, s.cell,
        [a.v[i] - c.cv[i] for i in range(1, 65)] AS r
      FROM v a JOIN asg s ON s.vec_id = a.vec_id
      JOIN cents c ON c.cell = s.cell),
    js AS (SELECT unnest(range(8)) AS j),
    rpick AS (
      SELECT j, r AS rv,
        CAST(ROW_NUMBER() OVER (PARTITION BY j
          ORDER BY md5(CAST(vec_id AS VARCHAR) || ':rpq:' || CAST(j AS VARCHAR)),
                   vec_id) AS INTEGER) - 1 AS code
      FROM res CROSS JOIN js
      QUALIFY code < 16),
    rcb AS (
      SELECT j, code, list_slice(rv, j*8 + 1, j*8 + 8) AS crsub,
        list_inner_product(list_slice(rv, j*8 + 1, j*8 + 8),
                           list_slice(rv, j*8 + 1, j*8 + 8)) AS crn
      FROM rpick),
    rsub AS (
      SELECT vec_id, cell, j, list_slice(r, j*8 + 1, j*8 + 8) AS rs,
        list_inner_product(list_slice(r, j*8 + 1, j*8 + 8),
                           list_slice(r, j*8 + 1, j*8 + 8)) AS rn2
      FROM res CROSS JOIN js),
    codes AS (
      SELECT vec_id AS neighbor_id, cell, j, code FROM (
        SELECT a.vec_id, a.cell, a.j, ct.code,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id, a.j
            ORDER BY ROUND(a.rn2 + ct.crn - 2 * list_inner_product(a.rs, ct.crsub), 6),
                     ct.code) AS rn
        FROM rsub a JOIN rcb ct USING (j))
      WHERE rn = 1),
    qprobe AS (
      SELECT query_id, cell, qres FROM (
        SELECT a.vec_id AS query_id, c.cell,
          [a.v[i] - c.cv[i] for i in range(1, 65)] AS qres,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
            ORDER BY ROUND(a.vn + c.cn - 2 * list_inner_product(a.v, c.cv), 6),
                     c.cell) AS rn
        FROM v a CROSS JOIN cents c WHERE a.vec_id < 10)
      WHERE rn <= 2),
    lut AS (
      SELECT q.query_id, q.cell, ct.j, ct.code,
        CAST(ROUND((list_inner_product(q.qs, q.qs) + ct.crn
          - 2 * list_inner_product(q.qs, ct.crsub)) * 1e6) AS BIGINT) AS d2m
      FROM (SELECT query_id, cell, j,
              list_slice(qres, j*8 + 1, j*8 + 8) AS qs
            FROM qprobe CROSS JOIN js) q
      JOIN rcb ct USING (j)),
    scored AS (
      SELECT query_id, neighbor_id, CAST(SUM(d2m) AS BIGINT) AS adc_micro
      FROM codes JOIN lut USING (cell, j, code)
      WHERE query_id <> neighbor_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_micro,
      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY adc_micro, neighbor_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 5"""))

  /** Top principal direction of the embedding corpus by Gram-matrix
    * power iteration ([[Similarity.gramTopDirection]], 3 rounds) — the
    * PCA step. The oracle unrolls the identical fixed-point recursion:
    * milli-quantized Gram cells (exact integer sums), per-round
    * list_inner_product against the ordered direction array, max-norm
    * renormalization, micro re-quantization. The one corpus-sized pass
    * is the combinable Gram aggregate; every round frame is dim-sized. */
  private val x_embed_pca_power = Q(
    "x_embed_pca_power",
    (s, d) => Similarity.gramTopDirection(
      Tables.embeddings(s, d), dim = 64, rounds = 3),
    Some {
      def step(r: Int) = {
        val p = r - 1
        s"""t$r AS (
          SELECT i, list_inner_product(grow,
            (SELECT list(CAST(wm AS DOUBLE) / 1e6 ORDER BY j) FROM w$p)) AS ti
          FROM g),
        m$r AS (SELECT MAX(ABS(ti)) AS mx FROM t$r),
        w$r AS (
          SELECT i AS j, CAST(ROUND(ti / mx * 1e6) AS BIGINT) AS wm
          FROM t$r CROSS JOIN m$r)"""
      }
      s"""WITH vm AS (
        SELECT list_transform(embedding,
          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS vm
        FROM embeddings WHERE embedding IS NOT NULL),
      cells AS (
        SELECT CAST(ti.i AS INTEGER) AS i, CAST(tj.j AS INTEGER) AS j,
               vm[CAST(ti.i AS INTEGER) + 1] * vm[CAST(tj.j AS INTEGER) + 1] AS p
        FROM vm CROSS JOIN range(64) ti(i) CROSS JOIN range(64) tj(j)),
      g AS (
        SELECT i, list(CAST(gm AS DOUBLE) / 1e6 ORDER BY j) AS grow FROM (
          SELECT i, j, SUM(p) AS gm FROM cells GROUP BY i, j)
        GROUP BY i),
      w0 AS (
        SELECT CAST(t.j AS INTEGER) AS j, CAST(1000000 AS BIGINT) AS wm
        FROM range(64) t(j)),
      ${step(1)},
      ${step(2)},
      ${step(3)}
      SELECT j AS dim, wm AS w_micro FROM w3"""
    })

  // --------------------------------------------------------------- text

  /** Per-document text statistics: token counts (whitespace + BPE-ish
    * regex), lexical diversity, quality score. */
  private val x_text_stats = Q(
    "x_text_stats",
    // staged form: token arrays computed once per row, not once per
    // consuming expression (TextOps.withTextStats doc)
    (s, d) => TextOps.withTextStats(
        Tables.documents(s, d).filter(col("text").isNotNull), col("text"))
      .select(col("doc_id"), col("n_chars_calc"), col("n_tokens"),
        col("n_subwords"), col("n_distinct_tokens"), col("quality_score")),
    Some(s"""SELECT doc_id,
      length(text) AS n_chars_calc,
      len(string_split(lower(text), ' ')) AS n_tokens,
      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subwords,
      len(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens,
      ${TextOps.qualityScoreSql("text")} AS quality_score
    FROM documents WHERE text IS NOT NULL"""))

  /** Marker-word language-ID heuristic vs the labeled lang column. */
  private val x_text_langid = Q(
    "x_text_langid",
    // staged form (2.2× vs the inline Column expression at sf0.1)
    (s, d) => TextOps.withLangId(
        Tables.documents(s, d).filter(col("text").isNotNull),
        col("text"), "lang_pred")
      .select(col("doc_id"), col("lang"), col("lang_pred")),
    Some("""WITH t AS (
      SELECT doc_id, lang, text,
             list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents WHERE text IS NOT NULL),
    s AS (
      SELECT doc_id, lang, text,
        len(list_intersect(toks, ['the','a','of','and','is'])) AS s_en,
        len(list_intersect(toks, ['der','die','das','und','ist'])) AS s_de,
        len(list_intersect(toks, ['el','los','y','es','una'])) AS s_es,
        len(list_intersect(toks, ['le','la','et','les','est'])) AS s_fr
      FROM t)
    SELECT doc_id, lang,
      CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
           WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
           WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
           WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
           WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM s"""))

  /** Deterministic train/val/test split + hash-Bernoulli sampling over
    * the corpus (graft.ops.Sampling): assignment is a pure expression
    * of the doc key — reproducible across engines/runs/layout, no RNG —
    * and the ORACLE RECOMPUTES THE HASH ITSELF (DuckDB md5_number_lower
    * == our md5-hex byte-reverse), pinning every row's split membership
    * and sample bit, not just the split sizes. */
  private val x_split_sample = Q(
    "x_split_sample",
    (s, d) => {
      val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
      Tables.documents(s, d)
        .select(col("doc_id"),
          Sampling.splitLabel(col("doc_id"), splits).as("split"),
          Sampling.hashSamplePredicate(col("doc_id"), 100).as("in_10pct_sample"))
    },
    Some(s"""SELECT doc_id,
      ${Sampling.splitLabelSql("doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))} AS split,
      ${Sampling.hashSamplePredicateSql("doc_id", 100)} AS in_10pct_sample
    FROM documents"""))

  /** Flagship end-to-end curation pipeline, the composition a training
    * corpus actually runs: quality gate → exact-duplicate collapse
    * (min-id representative, copy count kept) → deterministic 90/10
    * train split → token-budget sequence packing. Every stage is one of
    * the library operators; the oracle recomputes the whole composition
    * in SQL, so the INTERACTION of the stages is hash-checked, not just
    * each stage alone. One digest shuffle + one window shuffle
    * end-to-end; everything else is per-row. */
  private val x_curation_pipeline = Q(
    "x_curation_pipeline", {
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val scored = TextOps.withTextStats(docs, col("text"))
          .filter(col("quality_score") >= 0.5)
        val reps = Dedup.collapseExact(scored, col("doc_id"), col("text"),
          keep = Seq(col("lang")))
        val train = reps
          .filter(Sampling.splitLabel(col("doc_id"),
            Seq("train" -> 90, "val" -> 10)) === "train")
          .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        Packing.packSequences(train, col("doc_id"), col("n_tokens"),
          maxTokens = 512, shards = 8)
          .select(col("doc_id"), col("lang"), col("n_copies"),
            col("n_tokens"), col("pack_shard"), col("pack_bin"))
      }
    }, {
      val split = Sampling.splitLabelSql("doc_id", Seq("train" -> 90, "val" -> 10))
      val (shardSql, binSql) =
        Packing.packSequencesSql("doc_id", "n_tokens", maxTokens = 512, shards = 8)
      Some(s"""WITH scored AS (
        SELECT doc_id, lang, text,
          ${TextOps.qualityScoreSql("text")} AS quality_score
        FROM documents WHERE text IS NOT NULL),
      reps AS (
        SELECT arg_min(doc_id, doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
               arg_min(text, doc_id) AS text, count(*) AS n_copies
        FROM scored WHERE quality_score >= 0.5
        GROUP BY md5(lower(trim(text)))),
      train AS (
        SELECT doc_id, lang, n_copies,
               len(string_split(lower(text), ' ')) AS n_tokens
        FROM reps WHERE $split = 'train')
      SELECT doc_id, lang, n_copies, n_tokens,
        $shardSql AS pack_shard, $binSql AS pack_bin
      FROM train""")
    })

  /** Stratified exactly-k sampling (Sampling.stratifiedSample): the 20
    * lowest-hashing docs per language — deterministic eval-set
    * construction with guaranteed per-group counts. Oracle recomputes
    * the same hash order in a DuckDB QUALIFY. */
  private val x_stratified_sample = Q(
    "x_stratified_sample",
    (s, d) => Sampling.stratifiedSample(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), k = 20),
    Some(s"""SELECT doc_id, lang FROM documents
      QUALIFY ${Sampling.stratifiedSampleSql("lang", "doc_id", 20)}"""))

  /** Length-weighted corpus sample via priority sampling
    * ([[Sampling.prioritySample]], Duffield-Lund-Thorup): top-100 rows
    * by w/u priority with hash-derived u — weight-proportional inclusion
    * with NO replacement and NO RNG state, plan shape
    * TakeOrderedAndProject (per-partition heaps, no global sort). The
    * oracle recomputes every priority from the same md5 formula and
    * replays the ranking, so selection AND order are value-checked. */
  private val x_sample_priority = Q(
    "x_sample_priority",
    (s, d) => Sampling.prioritySample(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      col("doc_id"), col("n_chars"), k = 100),
    Some(s"""WITH t AS (
      SELECT doc_id, lang, n_chars,
        ${Sampling.prioritySql("doc_id", "n_chars")} AS pri
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL)
    SELECT doc_id, lang, n_chars,
      CAST(ROW_NUMBER() OVER (ORDER BY pri DESC, doc_id) AS INTEGER) AS rank
    FROM t
    QUALIFY rank <= 100"""))

  /** Weighted sampling WITHOUT replacement (Sampling.aresSample —
    * Efraimidis–Spirakis A-Res): top-100 documents by the ln(u)/w
    * exponential key with w = n_chars, the scheme whose inclusion
    * probabilities are exactly weight-proportional-without-replacement
    * (the distributional guarantee the w/u priority sample above
    * doesn't make). Same TakeOrderedAndProject plan shape; the pico-
    * quantized key is emitted so the oracle pins the whole order. */
  private val x_sample_ares = Q(
    "x_sample_ares",
    (s, d) => Sampling.aresSample(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
      col("doc_id"), col("n_chars"), k = 100),
    Some(s"""WITH t AS (
      SELECT doc_id, lang, n_chars,
        ${Sampling.aresKeySql("doc_id", "n_chars")} AS key_pico
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0 AND doc_id IS NOT NULL)
    SELECT doc_id, lang, n_chars, key_pico,
      CAST(ROW_NUMBER() OVER (ORDER BY key_pico DESC, doc_id) AS INTEGER)
        AS rank
    FROM t
    QUALIFY rank <= 100"""))

  /** Corpus mixture control (Sampling): language-balanced remix of the
    * documents table — downsample dominant `en` to 40% via the per-domain
    * hash predicate, then fractional repetition weights (de×2.5, zh×0.4)
    * emit floor/ceil copies per key with a 0-based `rep` index. Both
    * halves are pure hash expressions, recomputed exactly by DuckDB. */
  private val x_mixture_weighted = Q(
    "x_mixture_weighted", {
      (s, d) => {
        val rates = Seq("en" -> 400)
        val weights = Seq("de" -> 2.5, "zh" -> 0.4)
        val kept = Tables.documents(s, d)
          .filter(Sampling.mixtureSamplePredicate(col("doc_id"), col("lang"), rates))
          .select(col("doc_id"), col("lang"))
        Sampling.repeatWeighted(kept, col("doc_id"), col("lang"), weights)
          .withColumn("rep", col("rep").cast("int"))
      }
    }, {
      val rateSql = Sampling.mixtureSamplePredicateSql("doc_id", "lang", Seq("en" -> 400))
      val copiesSql = Sampling.repeatCopiesSql("doc_id", "lang", Seq("de" -> 2.5, "zh" -> 0.4))
      Some(s"""WITH kept AS (
        SELECT doc_id, lang FROM documents WHERE $rateSql),
      counted AS (
        SELECT doc_id, lang, $copiesSql AS n FROM kept)
      SELECT doc_id, lang,
        CAST(unnest(generate_series(1, n)) - 1 AS INTEGER) AS rep
      FROM counted""")
    })

  /** PII redaction (TextOps.redactPii): emails then phone-shaped digit
    * runs replaced with typed placeholders. The synthetic corpus has no
    * PII, so each row gets a deterministic contact line appended before
    * redaction — every row exercises both patterns, and the oracle runs
    * the identical construction + regexes in DuckDB. */
  private val x_text_redact = Q(
    "x_text_redact",
    (s, d) => {
      val withPii = concat(col("text"),
        lit(" Contact: user"), col("doc_id"), lit("@example.com or +1 (555) 010-"),
        lpad(col("doc_id") % 10000, 4, "0"), lit("."))
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), TextOps.redactPii(withPii).as("clean_text"))
    },
    Some(s"""SELECT doc_id,
      ${TextOps.redactPiiSql(
        "concat(text, ' Contact: user', doc_id, '@example.com or +1 (555) 010-', " +
          "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), '.')")} AS clean_text
    FROM documents WHERE text IS NOT NULL"""))

  /** Sequence packing (Packing.packSequences): greedy token-budget
    * binning into training sequences — sharded for parallelism, window
    * cumsum within shards, bin cut when the budget line is crossed.
    * Pure window SQL, so DuckDB recomputes the identical (shard, bin)
    * assignment per document. */
  private val x_pack_sequences = Q(
    "x_pack_sequences", {
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        Packing.packSequences(docs, col("doc_id"), col("n_tokens"),
          maxTokens = 512, shards = 8)
      }
    }, {
      val (shardSql, binSql) =
        Packing.packSequencesSql("doc_id", "n_tokens", maxTokens = 512, shards = 8)
      Some(s"""WITH t AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, n_tokens,
        $shardSql AS pack_shard,
        $binSql AS pack_bin
      FROM t""")
    })

  /** Benchmark decontamination (Dedup.decontaminate ∘ Sampling): carve
    * a deterministic 5% eval split, then ANTI-join the remaining
    * training rows against the eval set's CONTENT digests — rows whose
    * text also appears in eval are dropped even under different ids.
    * The oracle recomputes split membership AND digest overlap. */
  private val x_decontaminate = Q(
    "x_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val inEval = Sampling.hashSamplePredicate(col("doc_id"), 50)
      Dedup.decontaminate(
        docs.filter(!inEval).select(col("doc_id"), col("lang"), col("text")),
        col("text"),
        docs.filter(inEval), col("text"))
        .select(col("doc_id"), col("lang"))
    },
    Some(s"""WITH docs AS (
      SELECT doc_id, lang, text, md5(lower(trim(text))) AS dig
      FROM documents WHERE text IS NOT NULL),
    ev AS (SELECT DISTINCT dig FROM docs
           WHERE ${Sampling.hashSamplePredicateSql("doc_id", 50)})
    SELECT doc_id, lang FROM docs
    WHERE NOT ${Sampling.hashSamplePredicateSql("doc_id", 50)}
      AND dig NOT IN (SELECT dig FROM ev)"""))

  /** Bloom-prefiltered decontamination (Dedup.decontaminateBloom): the
    * 100 TB-shape variant of x_decontaminate — a Bloom filter over the
    * eval digests runs map-side, definitely-clean rows bypass the
    * anti-join entirely, and only might-contain candidates reach the
    * exact check that removes false positives. The result is provably
    * identical to the plain anti-join at ANY filter size, so the
    * ORACLE IS THE PLAIN ANTI-JOIN — the hash match proves the bloom
    * shortcut loses and invents nothing. */
  private val x_decontaminate_bloom = Q(
    "x_decontaminate_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val inEval = Sampling.hashSamplePredicate(col("doc_id"), 50)
      Dedup.decontaminateBloom(
        docs.filter(!inEval).select(col("doc_id"), col("lang"), col("text")),
        col("text"),
        docs.filter(inEval), col("text"))
        .select(col("doc_id"), col("lang"))
    },
    Some(s"""WITH docs AS (
      SELECT doc_id, lang, text, md5(lower(trim(text))) AS dig
      FROM documents WHERE text IS NOT NULL),
    ev AS (SELECT DISTINCT dig FROM docs
           WHERE ${Sampling.hashSamplePredicateSql("doc_id", 50)})
    SELECT doc_id, lang FROM docs
    WHERE NOT ${Sampling.hashSamplePredicateSql("doc_id", 50)}
      AND dig NOT IN (SELECT dig FROM ev)"""))

  /** Sliding token-window chunking (TextOps.chunk): 64-token chunks
    * overlapping by 16 — the embedding/context prep step. Pure explode
    * of window arithmetic; DuckDB recomputes the identical chunk count,
    * boundaries and text. */
  private val x_text_chunks = Q(
    "x_text_chunks", {
      (s, d) =>
        TextOps.chunk(
          Tables.documents(s, d).filter(col("text").isNotNull)
            .select(col("doc_id"), col("text")),
          col("text"), chunkTokens = 64, overlap = 16)
          .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    }, {
      val (nChunksSql, chunkTextSql) = TextOps.chunkSqlParts("toks", 64, 16)
      Some(s"""WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
      c AS (SELECT doc_id, toks, $nChunksSql AS n FROM t),
      e AS (SELECT doc_id, toks,
              CAST(unnest(generate_series(0, n - 1)) AS INTEGER) AS chunk_id
            FROM c)
      SELECT doc_id, chunk_id, $chunkTextSql AS chunk_text FROM e""")
    })

  /** Top-5 terms per language by document frequency — the explode-heavy
    * text-aggregation shape (one row per token) that dominates corpus
    * statistics at scale. Partial (map-side) aggregation absorbs the
    * token blowup before the shuffle; top-k per group runs as a
    * WindowGroupLimit (per-partition k-heap), not a full group sort.
    * Counts are integers and the tiebreak is total, so ranking is
    * engine-exact. */
  private val x_text_topterms = Q(
    "x_text_topterms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .select(col("lang"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) >= 3)
      val counts = toks.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("n_docs_term"))
      counts.withColumn("rank",
          row_number().over(Window.partitionBy(col("lang"))
            .orderBy(col("n_docs_term").desc, col("tok"))))
        .filter(col("rank") <= 5)
    },
    Some("""WITH toks AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    counts AS (
      SELECT lang, tok, count(*) AS n_docs_term
      FROM toks WHERE length(tok) >= 3
      GROUP BY 1, 2)
    SELECT lang, tok, n_docs_term,
      CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_docs_term DESC, tok)
        AS INTEGER) AS rank
    FROM counts
    QUALIFY rank <= 5"""))

  /** Per-document top-3 terms by smoothed TF-IDF — corpus-statistics
    * feature extraction (TextOps.tfIdfTopK): three map-side-combinable
    * aggregations + the 1-row corpus size cross-joined in; ln() rounded
    * to 6dp before ranking so the order is engine-exact. */
  private val x_text_tfidf = Q(
    "x_text_tfidf",
    (s, d) => TextOps.tfIdfTopK(
        Tables.documents(s, d).filter(col("text").isNotNull),
        col("doc_id"), col("text"), k = 3)
      .withColumnRenamed("__id", "doc_id"),
    Some("""WITH docs AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM docs),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE length(term) >= 3 GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM docs),
    scored AS (
      SELECT doc_id, term, tf,
        ROUND(tf * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, tfidf,
      CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, term) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 3"""))

  /** Winnowing rolling-hash fingerprints (xxhash64 — no oracle; scheme
    * checked in TextOpsSpec). Output: per-doc fingerprint count. */
  /** Winnowing document fingerprints — Karp–Rabin rolling-hash char-gram
    * variant (Schleimer et al.'s own hash family): O(1) per gram in the
    * kernel, and the ORACLE REPLAYS THE SELECTION: DuckDB rebuilds the
    * gram grid via the same Horner fold, every window minimum and the
    * distinct-fingerprint count per doc. The xxhash64 byte-gram kernel
    * (TextOps.withFingerprints) remains for byte-stream inputs. */
  private val x_text_fingerprint = Q(
    "x_text_fingerprint",
    (s, d) => TextOps.withFingerprintsRolling(
        Tables.documents(s, d).filter(col("text").isNotNull), col("text"), "fp")
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints")),
    Some(s"""WITH ${TextOps.rollingWinnowSqlCtes(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)", "wm")}
    SELECT doc_id, CAST(len(list_distinct(mins)) AS INTEGER) AS n_fingerprints
    FROM wm"""))

  /** N-gram-overlap decontamination (Dedup.contaminationNgramReport):
    * training docs sharing any word 4-gram with the held-out eval slice
    * (doc_id % 20 == 0), with the count of distinct shared grams — the
    * GPT-3-style contamination check that catches eval text QUOTED
    * inside larger training pages, which whole-text digest matching
    * (x_decontaminate) misses. (Published pipelines use n=13; the
    * synthetic corpus's docs are short, so n=4 is the length at which
    * its near-dup structure actually surfaces — 49 flagged docs vs 2.)
    * The ORACLE REBUILDS both gram sets via list slicing and recomputes
    * every hit count. */
  private val x_decontaminate_ngram = Q(
    "x_decontaminate_ngram",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      Dedup.contaminationNgramReport(
        docs.filter(col("doc_id") % 20 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 20 === 0), col("text"), n = 4)
    },
    Some("""WITH tr AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents WHERE text IS NOT NULL AND doc_id % 20 != 0),
    ev AS (
      SELECT string_split(lower(text), ' ') AS t
      FROM documents WHERE text IS NOT NULL AND doc_id % 20 = 0),
    evg AS (
      SELECT DISTINCT unnest([array_to_string(t[i:i+3], ' ')
                              for i in range(1, len(t) - 2)]) AS g
      FROM ev),
    trg AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+3], ' ')
                                           for i in range(1, len(t) - 2)])) AS g
      FROM tr)
    SELECT doc_id, COUNT(*) AS n_hit_grams
    FROM trg JOIN evg USING (g)
    GROUP BY 1"""))

  /** Corpus-LM quality scoring (TextOps.unigramLogProb): mean unigram
    * log-probability per document under the corpus's own token
    * distribution — the CCNet-style perplexity-proxy filter. Per-term
    * log-probs are fixed-pointed to integer micro-nats so every SUM is
    * exact integer arithmetic; the ORACLE RE-DERIVES the vocabulary,
    * corpus total, per-term micro-nat table and per-doc mean. */
  private val x_text_unigram_logprob = Q(
    "x_text_unigram_logprob",
    (s, d) => TextOps.unigramLogProb(
      Tables.documents(s, d).filter(col("text").isNotNull),
      col("doc_id"), col("text")),
    Some(s"""WITH src AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    ${TextOps.unigramLogProbSql("src")}
    SELECT doc_id, n_tokens, avg_logprob FROM scored"""))

  /** Gopher-style repetition filters (TextOps.gopherQuality): the Rae
    * et al. curation rules — distinct-word ratio, most-common-word and
    * most-common-bigram fractions, combined pass flag — adapted to word
    * granularity (this corpus has no line structure). Counts-only
    * aggregation (the gram strings never leave their groupBy), so no
    * tie-breaking anywhere; the oracle replays the full explode →
    * count → collapse chain. */
  private val x_text_gopher_quality = Q(
    "x_text_gopher_quality",
    (s, d) => TextOps.gopherQuality(
      Tables.documents(s, d).filter(col("text").isNotNull),
      col("doc_id"), col("text")),
    Some(s"""WITH src AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    ${TextOps.gopherQualitySql("src", "gq")}
    SELECT * FROM gq"""))

  /** Fixed-point PageRank (Graph.pageRankFixedPoint) over the
    * customer–supplier bipartite graph (distinct trade edges from
    * orders ⋈ lineitem, symmetrized; customers get even node ids,
    * suppliers odd). Integer-only arithmetic makes the iterative
    * result BIT-EXACT — the oracle replays all three iterations as
    * unrolled DuckDB CTEs, something float PageRank could never
    * hash-match across engines. */
  private val x_graph_pagerank = Q(
    "x_graph_pagerank",
    (s, d) => {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      // even/odd id spaces are disjoint, so the two directions cannot
      // collide: the union is already distinct
      val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
      Graph.pageRankFixedPoint(edges, iters = 3)
    },
    Some {
      val fp = Graph.RankFp
      def step(i: Int) =
        s"""c$i AS (
          SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS s
          FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1),
        r$i AS (
          SELECT d.node, d.deg,
            (($fp // n_nodes) * 15) // 100 + (COALESCE(c.s, 0) * 85) // 100 AS r
          FROM deg d CROSS JOIN n LEFT JOIN c$i c ON c.node = d.node)"""
      s"""WITH eraw AS (
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM eraw
        UNION ALL SELECT b AS src, a AS dst FROM eraw),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_nodes FROM deg),
      r0 AS (SELECT node, deg, $fp // n_nodes AS r FROM deg CROSS JOIN n),
      ${step(1)},
      ${step(2)},
      ${step(3)}
      SELECT node, deg, r AS rank_fp FROM r3"""
    })

  /** One GraphSAGE mean-aggregation round ([[Graph.sageMeanStep]]) over
    * the symmetric customer–supplier graph — the GNN feature-pipeline
    * step run before any model sees the graph: per (node, dim), the
    * node's own hash-derived feature and the EXACT mean of its
    * neighbors' features, with NO feature join (features computed
    * in-row from the neighbor id on each message; a real embedding
    * table drops in as a join). One combinable groupBy over the
    * edge×dim explode — a hot node is a big combinable group, not a
    * window partition. The oracle recomputes every feature, integer
    * sum, and division. */
  private val x_graph_sage = Q(
    "x_graph_sage_step",
    (s, d) => {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
      Graph.sageMeanStep(edges, dims = 4)
    },
    Some(s"""WITH eraw AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (
      SELECT a AS src, b AS dst FROM eraw
      UNION ALL SELECT b, a FROM eraw),
    msgs AS (
      SELECT src, dd.d,
        ${Sampling.hashValueSql(
          "'sage:' || CAST(dd.d AS VARCHAR) || ':' || CAST(dst AS VARCHAR)")}
          % 2001 - 1000 AS f
      FROM edges CROSS JOIN (SELECT unnest(range(4)) AS d) dd)
    SELECT src AS node, CAST(d AS INTEGER) AS d, COUNT(*) AS n_neighbors,
      ${Sampling.hashValueSql(
        "'sage:' || CAST(d AS VARCHAR) || ':' || CAST(src AS VARCHAR)")}
        % 2001 - 1000 AS self_milli,
      ROUND(CAST(SUM(f) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        AS neigh_mean_milli
    FROM msgs
    GROUP BY src, d"""))

  /** HITS hubs/authorities ([[Graph.hitsFixedPoint]], 2 rounds) over
    * the directed customer→supplier graph — the link-analysis
    * complement to PageRank: hub scores for buyers, authority scores
    * for suppliers, mutually recursive, max-normalized to micro longs
    * each half-round so the oracle unrolls both rounds bit-exactly
    * (the pagerank/gram-power fixed-point discipline). */
  private val x_graph_hits = Q(
    "x_graph_hits",
    (s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      Graph.hitsFixedPoint(edges, rounds = 2)
    },
    Some {
      def half(inRel: String, inCol: String, joinOn: String, outCol: String,
               grpCol: String, rawRel: String, outRel: String) =
        s"""$rawRel AS (
          SELECT $grpCol AS node, CAST(SUM($inCol) AS BIGINT) AS r
          FROM e JOIN $inRel x ON x.node = e.$joinOn GROUP BY 1),
        $outRel AS (
          SELECT node, CAST(ROUND(CAST(r AS DOUBLE)
            / CAST((SELECT MAX(r) FROM $rawRel) AS DOUBLE) * 1e6) AS BIGINT)
            AS $outCol
          FROM $rawRel)"""
      s"""WITH e AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      a0 AS (
        SELECT DISTINCT dst AS node, CAST(1000000 AS BIGINT) AS a FROM e),
      ${half("a0", "a", "dst", "h", "e.src", "h1r", "h1")},
      ${half("h1", "h", "src", "a", "e.dst", "a1r", "a1")},
      ${half("a1", "a", "dst", "h", "e.src", "h2r", "h2")},
      ${half("h2", "h", "src", "a", "e.dst", "a2r", "a2")}
      SELECT node, 'hub' AS role, h AS score_micro FROM h2
      UNION ALL
      SELECT node, 'authority' AS role, a AS score_micro FROM a2"""
    })

  /** DIRECTED PageRank (Graph.pageRankConverged) over the asymmetric
    * customer→supplier trade graph: suppliers never link out, so every
    * supplier node is a SINK and the dangling-mass redistribution path
    * is load-bearing — without it ~half the rank mass would leak each
    * iteration and every value would drift from the oracle. The
    * convergence stop is exact-integer (max |Δr| = 0), so the unrolled
    * 3-iteration DuckDB replay matches whether or not Spark exits
    * early (a reached fixed point makes further iterations the
    * identity). */
  private val x_graph_pagerank_directed = Q(
    "x_graph_pagerank_directed",
    (s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      Graph.pageRankConverged(edges, maxIters = 3)._1
    },
    Some {
      val fp = Graph.RankFp
      def step(i: Int) =
        s"""c$i AS (
          SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS s
          FROM edges e JOIN r${i - 1} r ON e.src = r.node AND r.deg > 0
          GROUP BY 1),
        dg$i AS (
          SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang
          FROM r${i - 1} WHERE deg = 0),
        r$i AS (
          SELECT d.node, d.deg,
            (($fp // n_nodes) * 15) // 100
              + ((COALESCE(c.s, 0) + dang // n_nodes) * 85) // 100 AS r
          FROM deg d CROSS JOIN n CROSS JOIN dg$i
          LEFT JOIN c$i c ON c.node = d.node)"""
      s"""WITH edges AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      odeg AS (SELECT src AS node, COUNT(*) AS odeg FROM edges GROUP BY 1),
      deg AS (
        SELECT nodes.node, COALESCE(o.odeg, 0) AS deg
        FROM nodes LEFT JOIN odeg o ON o.node = nodes.node),
      n AS (SELECT COUNT(*) AS n_nodes FROM deg),
      r0 AS (SELECT node, deg, $fp // n_nodes AS r FROM deg CROSS JOIN n),
      ${step(1)},
      ${step(2)},
      ${step(3)}
      SELECT node, deg, r AS rank_fp FROM r3"""
    })

  /** Personalized PageRank ([[Graph.pageRankPersonalized]]) over the
    * symmetric trade graph with teleport mass concentrated on the seed
    * customers (custkey ≤ 5) — proximity-to-seeds importance ("more
    * like these" corpus expansion), integer fixed-point, the oracle
    * unrolling all 3 rounds bit-exactly. */
  private val x_graph_ppr = Q(
    "x_graph_ppr",
    (s, d) => {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
      val seeds = Tables.orders(s, d).filter(col("o_custkey") <= 5)
        .select((col("o_custkey") * 2).as("node"))
      Graph.pageRankPersonalized(edges, seeds, iters = 3)
    },
    Some {
      val fp = Graph.RankFp
      def step(i: Int) =
        s"""c$i AS (
          SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS s
          FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1),
        r$i AS (
          SELECT b.node, b.deg, b.p,
            (b.p * 15) // 100 + (COALESCE(c.s, 0) * 85) // 100 AS r
          FROM base b LEFT JOIN c$i c ON c.node = b.node)"""
      s"""WITH eraw AS (
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (
        SELECT a AS src, b AS dst FROM eraw
        UNION ALL SELECT b AS src, a AS dst FROM eraw),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
      seeds AS (
        SELECT DISTINCT s.node FROM
          (SELECT DISTINCT o_custkey * 2 AS node FROM orders
           WHERE o_custkey <= 5) s
        JOIN deg d ON s.node = d.node),
      ns AS (SELECT COUNT(*) AS n_seeds FROM seeds),
      base AS (
        SELECT d.node, d.deg,
          CASE WHEN s.node IS NOT NULL THEN $fp // n_seeds ELSE 0 END AS p
        FROM deg d LEFT JOIN seeds s ON d.node = s.node CROSS JOIN ns),
      r0 AS (SELECT node, deg, p, p AS r FROM base),
      ${step(1)},
      ${step(2)},
      ${step(3)}
      SELECT node, deg, r AS rank_fp FROM r3"""
    })

  /** Multi-source BFS ([[Graph.bfsHops]]) over the undirected
    * customer↔supplier trade graph: minimum hop distance from the seed
    * customers (custkey ≤ 3) out to 3 hops — the reachability audit
    * shape (how much of the corpus graph sits within k links of a
    * trusted seed set). Frontier delta iteration: per-round edge work
    * is bounded by the frontier's incident edges, never the whole
    * graph. The oracle is a recursive CTE taking MIN(dist) over all
    * bounded walks — equal to BFS's first-discovery level by
    * shortest-path = shortest-walk. */
  private val x_graph_bfs = Q(
    "x_graph_bfs",
    (s, d) => {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
      val seeds = Tables.orders(s, d).filter(col("o_custkey") <= 3)
        .select((col("o_custkey") * 2).as("node"))
      Graph.bfsHops(edges, seeds, maxHops = 3)
    },
    Some("""WITH RECURSIVE eraw AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT a AS src, b AS dst FROM eraw
      UNION ALL SELECT b AS src, a AS dst FROM eraw),
    walk AS (
      SELECT DISTINCT o_custkey * 2 AS node, 0 AS dist
      FROM orders WHERE o_custkey <= 3
      UNION
      SELECT e.dst AS node, w.dist + 1 AS dist
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.dist < 3)
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
    FROM walk GROUP BY node"""))

  /** Seed-sampled betweenness centrality — Brandes' algorithm (2001)
    * from 4 fixed seed customers over the customer–supplier order
    * graph, the standard sampling approximation (exact betweenness is
    * all-pairs): forward BFS accumulating shortest-path counts σ
    * (exact BIGINT sums level by level), then the backward dependency
    * sweep δ(v) = Σ_w (σ_v/σ_w)(1+δ_w) over (dist+1) successors —
    * each per-edge term one truncating integer division in micro
    * units (σ_v·(10⁶+δ_w) DIV σ_w, both engines), so the whole
    * accumulation is exact integer arithmetic. Top-20 bridge nodes by
    * summed dependency, the "which supplier is structurally critical"
    * question (σ products stay ≤ ~10¹³ at the 100× corpus — far
    * under BIGINT; the bound grows with max degree², not corpus).
    *
    * Scale shape: 3 forward + 2 backward passes, each ONE equi-join
    * of a level frontier against the checkpointed distinct edge list
    * + a combinable sum — the PageRank/HITS per-round profile; level
    * tables are node-bounded. */
  private val x_graph_betweenness = Q(
    "x_graph_betweenness",
    (s, d) => {
      val eraw = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
      // ONE exchange builds the checkpointed edge list: repartition
      // the doubled (still duplicated) pairs by src, then dedup via
      // distinct — hashpartitioning(src) already satisfies
      // ClusteredDistribution(src,dst), so the dedup aggregate adds
      // NO second exchange. Pre-sorting by src before the checkpoint
      // matters because LogicalRDD carries outputPartitioning AND
      // outputOrdering: all 5 downstream frontier joins (3 forward +
      // 2 backward, every one keyed node = src) then skip both the
      // Exchange and the Sort on the edge side — only the
      // node-bounded frontier shuffles per round
      val edges = eraw.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eraw.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src"))
        .distinct()
        .sortWithinPartitions(col("src"))
        .localCheckpoint(true) // 3 forward + 2 backward consumers
      val maxDepth = 3
      // no checkpoint on the seed frame: recomputing it is a 4-row
      // pushed-filter scan, cheaper than an eager materialization job
      var levels = Vector(
        Tables.customer(s, d).filter(col("c_custkey") <= 4)
          .select((col("c_custkey") * 2).as("seed"))
          .withColumn("node", col("seed"))
          .withColumn("sigma", lit(1L)))
      var visited = levels(0).select(col("seed"), col("node"))
      for (k <- 1 to maxDepth) {
        val next = levels(k - 1)
          .join(edges, col("node") === col("src"))
          .groupBy(col("seed"), col("dst"))
          .agg(sum(col("sigma")).as("sigma"))
          .withColumnRenamed("dst", "node")
          .join(visited, Seq("seed", "node"), "left_anti")
          .localCheckpoint(true)
        levels = levels :+ next
        visited = visited.unionByName(next.select(col("seed"), col("node")))
      }
      // backward dependency sweep: δ = 0 at the deepest level. Each
      // per-level delta frame is materialized as levels(k) LEFT JOIN
      // the computed sums with COALESCE(δ,0): a level-k node whose
      // successors were ALL already visited (a leaf of the BFS dag)
      // has δ=0 but must still be present, so at level k−1 its
      // (10⁶+0)·σ_v DIV σ_w term is not silently dropped — the
      // documented Brandes dependency formula, now complete.
      // Each delta frame carries σ alongside δ so the next round's
      // `down` side IS the frame itself — no levels(k+1)⋈deltas join.
      var deltas = Vector(
        levels(maxDepth).select(col("seed"), col("node"), col("sigma"),
          lit(0L).as("delta_micro")))
      for (k <- (maxDepth - 1) to 1 by -1) {
        val down = deltas.head
          .select(col("seed").as("__wseed"), col("node").as("__w"),
            col("sigma").as("__sw"), col("delta_micro").as("__dw"))
        val sums = levels(k)
          .join(edges, col("node") === col("src"))
          .join(down, col("seed") === col("__wseed")
            && col("dst") === col("__w"))
          .select(col("seed"), col("node"),
            expr("sigma * (1000000 + __dw) DIV __sw").as("term"))
          .groupBy(col("seed"), col("node"))
          .agg(sum(col("term")).as("delta_sum"))
        val dk0 = levels(k).select(col("seed"), col("node"), col("sigma"))
          .join(sums, Seq("seed", "node"), "left")
          .select(col("seed"), col("node"), col("sigma"),
            coalesce(col("delta_sum"), lit(0L)).as("delta_micro"))
        // the k=1 frame has a single consumer (the final union) —
        // checkpoint only the frames the next round re-reads
        val dk = if (k > 1) dk0.localCheckpoint(true) else dk0
        deltas = dk +: deltas
      }
      val all = deltas
        .map(_.select(col("seed"), col("node"), col("delta_micro")))
        .reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("betweenness_micro").desc, col("node"))
      all.groupBy(col("node"))
        .agg(sum(col("delta_micro")).as("betweenness_micro"),
          count(lit(1)).as("n_seeds_reaching"))
        .orderBy(col("betweenness_micro").desc, col("node"))
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("int"))
        .withColumn("node_type",
          when(col("node") % 2 === 0, "customer").otherwise("supplier"))
    },
    Some("""WITH eraw AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT a AS src, b AS dst FROM eraw
      UNION ALL SELECT b AS src, a AS dst FROM eraw),
    v0 AS (
      SELECT c_custkey * 2 AS seed, c_custkey * 2 AS node,
        CAST(1 AS BIGINT) AS sigma
      FROM customer WHERE c_custkey <= 4),
    v1 AS (
      SELECT v.seed, e.dst AS node, CAST(SUM(v.sigma) AS BIGINT) AS sigma
      FROM v0 v JOIN edges e ON v.node = e.src
      WHERE NOT EXISTS (SELECT 1 FROM v0 p
        WHERE p.seed = v.seed AND p.node = e.dst)
      GROUP BY 1, 2),
    v2 AS (
      SELECT v.seed, e.dst AS node, CAST(SUM(v.sigma) AS BIGINT) AS sigma
      FROM v1 v JOIN edges e ON v.node = e.src
      WHERE NOT EXISTS (SELECT 1 FROM v0 p
          WHERE p.seed = v.seed AND p.node = e.dst)
        AND NOT EXISTS (SELECT 1 FROM v1 p
          WHERE p.seed = v.seed AND p.node = e.dst)
      GROUP BY 1, 2),
    v3 AS (
      SELECT v.seed, e.dst AS node, CAST(SUM(v.sigma) AS BIGINT) AS sigma
      FROM v2 v JOIN edges e ON v.node = e.src
      WHERE NOT EXISTS (SELECT 1 FROM v0 p
          WHERE p.seed = v.seed AND p.node = e.dst)
        AND NOT EXISTS (SELECT 1 FROM v1 p
          WHERE p.seed = v.seed AND p.node = e.dst)
        AND NOT EXISTS (SELECT 1 FROM v2 p
          WHERE p.seed = v.seed AND p.node = e.dst)
      GROUP BY 1, 2),
    d3 AS (
      SELECT seed, node, CAST(0 AS BIGINT) AS delta_micro FROM v3),
    d2s AS (
      SELECT v.seed, v.node,
        CAST(SUM(v.sigma * (1000000 + dw.delta_micro) // w.sigma)
          AS BIGINT) AS delta_sum
      FROM v2 v
      JOIN edges e ON v.node = e.src
      JOIN v3 w ON w.seed = v.seed AND w.node = e.dst
      JOIN d3 dw ON dw.seed = w.seed AND dw.node = w.node
      GROUP BY 1, 2),
    d2 AS (
      SELECT v.seed, v.node,
        COALESCE(s.delta_sum, CAST(0 AS BIGINT)) AS delta_micro
      FROM v2 v LEFT JOIN d2s s
        ON s.seed = v.seed AND s.node = v.node),
    d1s AS (
      SELECT v.seed, v.node,
        CAST(SUM(v.sigma * (1000000 + dw.delta_micro) // w.sigma)
          AS BIGINT) AS delta_sum
      FROM v1 v
      JOIN edges e ON v.node = e.src
      JOIN v2 w ON w.seed = v.seed AND w.node = e.dst
      JOIN d2 dw ON dw.seed = w.seed AND dw.node = w.node
      GROUP BY 1, 2),
    d1 AS (
      SELECT v.seed, v.node,
        COALESCE(s.delta_sum, CAST(0 AS BIGINT)) AS delta_micro
      FROM v1 v LEFT JOIN d1s s
        ON s.seed = v.seed AND s.node = v.node),
    acc AS (
      SELECT node, CAST(SUM(delta_micro) AS BIGINT) AS betweenness_micro,
        CAST(COUNT(*) AS BIGINT) AS n_seeds_reaching
      FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2
            UNION ALL SELECT * FROM d3)
      GROUP BY 1)
    SELECT node, betweenness_micro, n_seeds_reaching,
      CAST(ROW_NUMBER() OVER (ORDER BY betweenness_micro DESC, node)
        AS INTEGER) AS rank,
      CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
        AS node_type
    FROM acc
    ORDER BY betweenness_micro DESC, node
    LIMIT 20"""))

  /** Deterministic NEGATIVE SAMPLING for contrastive training: each
    * anchor document draws k=4 pseudo-random negatives from documents
    * in a DIFFERENT language (the "not this distribution" constraint),
    * ranked by md5(anchor|candidate) — bit-reproducible across runs and
    * engines, unlike rand()-based draws, so pair sets are stable under
    * retries and the oracle replays every pick. Scale shape: the
    * bounded anchor set broadcasts against one corpus stream
    * (row-linear per anchor) and the per-anchor top-k is a
    * WindowGroupLimit — no corpus×corpus pair space. */
  private val x_sample_negatives = Q(
    "x_sample_negatives",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("lang"))
      val anchors = docs.filter(col("doc_id") < 50)
        .select(col("doc_id").as("anchor_id"), col("lang").as("anchor_lang"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("anchor_id")).orderBy(col("rk"), col("neg_id"))
      docs.select(col("doc_id").as("neg_id"), col("lang").as("neg_lang"))
        .crossJoin(broadcast(anchors))
        .filter(col("neg_lang") =!= col("anchor_lang"))
        .withColumn("rk", md5(concat_ws("|",
          col("anchor_id").cast("string"), col("neg_id").cast("string"))))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 4)
        .select(col("anchor_id"), col("neg_id"), col("neg_lang"), col("rank"))
    },
    Some("""WITH docs AS (
      SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL),
    a AS (SELECT doc_id AS anchor_id, lang AS anchor_lang
          FROM docs WHERE doc_id < 50),
    scored AS (
      SELECT a.anchor_id, c.doc_id AS neg_id, c.lang AS neg_lang,
        md5(CAST(a.anchor_id AS VARCHAR) || '|' || CAST(c.doc_id AS VARCHAR)) AS rk
      FROM docs c CROSS JOIN a
      WHERE c.lang <> a.anchor_lang)
    SELECT anchor_id, neg_id, neg_lang,
      CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY rk, neg_id)
        AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= 4"""))

  /** Deterministic global shuffle + sharding (Sampling.withShardPlan):
    * the "write the corpus as N shuffled shards" terminal step. Every
    * row's (shard, pos) is a pure function of its key — bit-reproducible
    * output layout, unlike orderBy(rand()) — and the ORACLE RECOMPUTES
    * both: DuckDB re-derives the md5 bucket and the within-shard hash
    * order for all rows. One shuffle + per-shard window at any scale. */
  private val x_shard_plan = Q(
    "x_shard_plan",
    (s, d) => Sampling.withShardPlan(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      col("doc_id"), shards = 16), {
      val (shard, pos) = Sampling.shardPlanSql("doc_id", 16)
      Some(s"""SELECT doc_id, lang, $shard AS shard, $pos AS pos
        FROM documents""")
    })

  /** JSON-lines source/sink roundtrip: the corpus written as JSONL (the
    * interchange format LLM-data tooling actually speaks) and read back
    * with a PINNED schema — schema-on-read inference would cost a full
    * extra pass at 100 TB — then aggregated per language. The oracle
    * aggregates the parquet originals directly, so any escaping/encoding
    * loss in the JSON hop (unicode text, embedded quotes) breaks the
    * hash match. */
  private val x_source_jsonl = Q(
    "x_source_jsonl_roundtrip",
    (s, d) => {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_jsonl_roundtrip").getPath
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("text"))
        .write.mode("overwrite").json(path)
      s.read.schema("doc_id BIGINT, lang STRING, text STRING").json(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    },
    Some("""SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1"""))

  /** DataSource V2 scan with real planning integration
    * ([[graft.sources.GenSource]]): the pushed id range narrows the
    * generated interval AND prunes input partitions before execution,
    * the bucket predicate stays a post-scan residual, and column
    * pruning reaches the reader (GenSourceSpec pins all three against
    * the executed plan). The oracle regenerates the same table from
    * range() — every column is a pure function of id. */
  private val x_source_dsv2 = Q(
    "x_source_dsv2_pushdown",
    (s, d) => s.read.format("graftgen")
      .option("rows", "200000").option("parts", "32").load()
      .filter(col("id") >= 1000 && col("id") < 51000 && col("bucket") === 7)
      .select(col("id"), col("bucket"), col("payload")),
    Some("""SELECT id, CAST(id % 97 AS INTEGER) AS bucket,
      md5(CAST(id AS VARCHAR)) AS payload
    FROM range(0, 200000) t(id)
    WHERE id >= 1000 AND id < 51000 AND CAST(id % 97 AS INTEGER) = 7"""))

  /** COMPLETE aggregate pushdown through the DSv2 connector
    * ([[graft.sources.GenAggScan]]): ungrouped COUNT(*)/MIN/MAX over a
    * filtered id range are answered by the SOURCE as an O(1) closed
    * form of the pushed interval — one partition, one row, zero rows
    * generated (the DSv2 analogue of a parquet footer count;
    * GenSourceSpec asserts the GenAggScan node and the single
    * partition). The oracle computes the same aggregates the honest
    * way, over the materialized range. */
  private val x_source_dsv2_agg = Q(
    "x_source_dsv2_agg",
    (s, d) => s.read.format("graftgen")
      .option("rows", "5000000").option("parts", "32").load()
      .filter(col("id") >= 12345 && col("id") < 987654)
      .agg(count(lit(1)).as("n_rows"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id")),
    Some("""SELECT COUNT(*) AS n_rows, MIN(id) AS min_id, MAX(id) AS max_id
    FROM range(0, 5000000) t(id)
    WHERE id >= 12345 AND id < 987654"""))

  /** DSv2 TOP-N pushdown (`SupportsPushDownTopN`): ORDER BY id DESC
    * LIMIT 7 over a 5M-row source truncates the scan to the 7-row
    * interval TAIL at planning time — the scan generates 7 rows, not
    * 5M (GenSourceSpec asserts the plan's pushed range and row count).
    * Reported partially-pushed, so Spark re-sorts the 7 survivors
    * rather than trusting scan order — the semantically-safe contract
    * for a multi-partition source whose readers emit ascending. */
  private val x_source_dsv2_topn = Q(
    "x_source_dsv2_topn",
    (s, d) => s.read.format("graftgen")
      .option("rows", "5000000").option("parts", "32").load()
      .filter(col("id") >= 1000 && col("id") < 4000000)
      .select(col("id"), col("bucket"))
      .orderBy(col("id").desc)
      .limit(7),
    Some("""SELECT id, CAST(id % 97 AS INTEGER) AS bucket
    FROM range(0, 5000000) t(id)
    WHERE id >= 1000 AND id < 4000000
    ORDER BY id DESC LIMIT 7"""))

  /** Native bounded top-k aggregate ([[graft.functions.TopKByScore]],
    * a TypedImperativeAggregate): top-3 orders by value per priority
    * class. The window formulation shuffles every order to its group's
    * reducer; this aggregate ships at most k pairs per group per map
    * task (partial aggregation), the shape that survives groups of
    * millions. Oracle is the window formulation — identical rows,
    * different movement. */
  private val x_agg_topk_native = Q(
    "x_agg_topk_native",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("o_totalprice").cast("double"), col("o_orderkey"), 3).as("top"))
      .select(col("prio"), posexplode(col("top")))
      .select(col("prio"), (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("o_orderkey"), col("col.score").as("price")),
    Some("""SELECT o_orderpriority AS prio,
      CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS INTEGER) AS rank,
      o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY rank <= 3"""))

  /** Schema-evolution read: two parquet generations of one table —
    * v1 without a column, v2 with it — read through `mergeSchema`
    * (the additive-evolution contract a long-lived lakehouse table
    * accumulates; schema-on-read unification, missing columns NULL).
    * The oracle reconstructs the same union from the source rows, so a
    * row misassigned between generations or a dropped/ghost column
    * breaks the hash. */
  private val x_source_schema_merge = Q(
    "x_source_schema_merge",
    (s, d) => {
      val base = schemaMergeFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_schema_merge")
        val o = Tables.orders(s, d)
          .withColumn("yr", year(col("o_orderdate")))
        o.filter(col("yr") < 1997)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(t + "/v1")
        o.filter(col("yr") >= 1997)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(t + "/v2")
        t
      })
      s.read.option("mergeSchema", "true").parquet(base + "/v1", base + "/v2")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.sumMoney(col("o_totalprice")).as("revenue"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    },
    Some(s"""SELECT
      CASE WHEN year(o_orderdate) >= 1997 THEN o_orderstatus END AS o_orderstatus,
      COUNT(*) AS n_orders,
      ${Exact.sumMoneySql("o_totalprice")} AS revenue,
      MIN(o_orderkey) AS min_key,
      MAX(o_orderkey) AS max_key
    FROM orders GROUP BY 1"""))

  private val schemaMergeFixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** k-anonymity GENERALIZATION ladder — the remediation step the
    * [[EltQueries]] k-anonymity audit feeds: quasi-identifier classes
    * below k coarsen one rung at a time (nation → region → suppressed
    * '*') until every published class holds ≥ k rows or is fully
    * suppressed. Each rung is one combinable COUNT over only the rows
    * the previous rung demoted — work shrinks per level, output
    * bounded by |classes|. The oracle replays the whole ladder. */
  private val x_dq_k_generalize = Q(
    "x_dq_k_generalize",
    (s, d) => {
      val k = 20
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name").as("nat"),
          col("r_name").as("reg"), col("c_mktsegment").as("seg"))
      val c0 = cust.groupBy(col("nat"), col("seg"))
        .agg(count(lit(1)).as("n"))
      val ok0 = c0.filter(col("n") >= k)
        .select(col("nat").as("qi1"), col("seg").as("qi2"),
          lit(0).as("level"), col("n").as("n_rows"))
      val demoted0 = cust.join(
        c0.filter(col("n") < k).select(col("nat"), col("seg")),
        Seq("nat", "seg"), "left_semi")
      val c1 = demoted0.groupBy(col("reg"), col("seg"))
        .agg(count(lit(1)).as("n"))
      val ok1 = c1.filter(col("n") >= k)
        .select(col("reg").as("qi1"), col("seg").as("qi2"),
          lit(1).as("level"), col("n").as("n_rows"))
      val n2 = demoted0.join(
        c1.filter(col("n") < k).select(col("reg"), col("seg")),
        Seq("reg", "seg"), "left_semi")
        .agg(count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 0)
        .select(lit("*").as("qi1"), lit("*").as("qi2"),
          lit(2).as("level"), col("n_rows"))
      ok0.unionByName(ok1).unionByName(n2)
    },
    Some("""WITH cust AS (
      SELECT c_custkey, n_name AS nat, r_name AS reg, c_mktsegment AS seg
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey),
    c0 AS (SELECT nat, seg, COUNT(*) AS n FROM cust GROUP BY 1, 2),
    ok0 AS (
      SELECT nat AS qi1, seg AS qi2, 0 AS level, n AS n_rows
      FROM c0 WHERE n >= 20),
    d0 AS (
      SELECT cu.* FROM cust cu
      JOIN c0 ON cu.nat = c0.nat AND cu.seg = c0.seg AND c0.n < 20),
    c1 AS (SELECT reg, seg, COUNT(*) AS n FROM d0 GROUP BY 1, 2),
    ok1 AS (
      SELECT reg AS qi1, seg AS qi2, 1 AS level, n AS n_rows
      FROM c1 WHERE n >= 20),
    n2 AS (
      SELECT '*' AS qi1, '*' AS qi2, 2 AS level, COUNT(*) AS n_rows
      FROM d0 JOIN c1 ON d0.reg = c1.reg AND d0.seg = c1.seg AND c1.n < 20
      HAVING COUNT(*) > 0)
    SELECT qi1, qi2, CAST(level AS INTEGER) AS level,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM (SELECT * FROM ok0 UNION ALL SELECT * FROM ok1
          UNION ALL SELECT * FROM n2)"""))

  // --------------------------------------------------------- multimodal

  /** REAL image decode (javax.imageio): a distributed PNG corpus is
    * generated per doc (pixel (x,y) a pure integer function of
    * (doc_id,x,y)), ImageIO-encoded, then ImageIO-DECODED back and
    * reduced to per-channel pixel sums. PNG is lossless, so the ORACLE
    * REPLAYS THE DECODED PIXELS ARITHMETICALLY — DuckDB recomputes the
    * channel sums from the generator formula with no image library;
    * the hash can only match if Spark's encode→decode roundtrip
    * returned the exact pixels. (The video-container path has the same
    * proof shape over uncompressed AVI/RIFF — x_multimodal_video.) */
  private val x_multimodal_features = Q(
    "x_multimodal_features",
    (s, d) => Multimodal.decodePng(s,
        Multimodal.pngMediaTable(s, Tables.documents(s, d))).toDF()
      .withColumn("pixel_sum", col("sum_r") + col("sum_g") + col("sum_b")),
    Some("""WITH m AS (
      SELECT doc_id,
        CAST(doc_id % 24 + 8 AS INTEGER) AS w,
        CAST(doc_id % 16 + 8 AS INTEGER) AS ht
      FROM documents),
    s AS (
      SELECT doc_id, w, ht,
        CAST(list_sum([ (doc_id*31 + (i % w)*7 + (i // w)*13) % 256
                        for i in range(0, w*ht) ]) AS BIGINT) AS sum_r,
        CAST(list_sum([ (doc_id*17 + (i % w)*11 + (i // w)*5) % 256
                        for i in range(0, w*ht) ]) AS BIGINT) AS sum_g,
        CAST(list_sum([ (doc_id*23 + (i % w)*3 + (i // w)*19) % 256
                        for i in range(0, w*ht) ]) AS BIGINT) AS sum_b
      FROM m)
    SELECT doc_id, w AS width, ht AS height, sum_r, sum_g, sum_b,
      sum_r + sum_g + sum_b AS pixel_sum
    FROM s"""))

  /** REAL resize + strip-sample chain: PNG corpus → ImageIO decode →
    * explicit nearest-neighbor half-resize (`src = dst*srcDim/dstDim`,
    * integer floor) → ImageIO re-ENCODE → second ImageIO decode →
    * every-2nd 2-row strip emitted as its own row (the video frame-
    * sample 1:N explode shape, backed by really-decoded pixels) →
    * per-doc aggregate. Two real encodes and two real decodes are on
    * the line; the ORACLE REPLAYS THE WHOLE CHAIN in integer SQL from
    * the generator formula + the NN index mapping. */
  private val x_multimodal_resize_frames = Q(
    "x_multimodal_resize_frames",
    (s, d) => {
      val media = Multimodal.pngMediaTable(s, Tables.documents(s, d))
      Multimodal.stripSample(s, Multimodal.resizePngHalf(s, media),
          stripH = 2, everyK = 2)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_strips_sampled"),
          sum(col("strip_sum")).as("checksum_total"))
    },
    Some("""WITH m AS (
      SELECT doc_id,
        CAST(doc_id % 24 + 8 AS INTEGER) AS w,
        CAST(doc_id % 16 + 8 AS INTEGER) AS ht
      FROM documents),
    r AS (
      SELECT doc_id, w, ht,
        greatest(1, w // 2) AS w2, greatest(1, ht // 2) AS h2
      FROM m)
    SELECT doc_id,
      CAST(((h2 // 2) + 1) // 2 AS BIGINT) AS n_strips_sampled,
      CAST(list_sum([
        CASE WHEN (((j // w2) // 2) % 2) = 0 THEN
            (doc_id*31 + (((j % w2) * w) // w2)*7  + (((j // w2) * ht) // h2)*13) % 256
          + (doc_id*17 + (((j % w2) * w) // w2)*11 + (((j // w2) * ht) // h2)*5)  % 256
          + (doc_id*23 + (((j % w2) * w) // w2)*3  + (((j // w2) * ht) // h2)*19) % 256
        ELSE 0 END
        for j in range(0, w2 * ((h2 // 2) * 2)) ]) AS BIGINT) AS checksum_total
    FROM r
    WHERE h2 // 2 > 0"""))

  /** REAL audio decode (javax.sound.sampled): a distributed WAV corpus
    * is generated per doc (sample i a pure integer function of
    * (doc_id, i)), encoded through the JDK's WAV writer, then DECODED
    * back via AudioSystem and reduced to amplitude statistics. 16-bit
    * PCM in a WAV container is lossless, so the ORACLE REPLAYS THE
    * DECODED SAMPLES ARITHMETICALLY — the hash can only match if the
    * real encode→decode roundtrip returned the exact samples. */
  private val x_multimodal_audio = Q(
    "x_multimodal_audio",
    (s, d) => Multimodal.decodeWav(s,
      Multimodal.wavMediaTable(s, Tables.documents(s, d))).toDF(),
    Some("""WITH m AS (
      SELECT doc_id, CAST(doc_id % 400 + 100 AS INTEGER) AS n FROM documents)
    SELECT doc_id,
      CAST(n AS BIGINT) AS n_samples,
      CAST(list_sum([ (doc_id*7919 + i*2654435761) % 65536 - 32768
                      for i in range(0, n) ]) AS BIGINT) AS sum_amp,
      CAST(list_sum([ abs((doc_id*7919 + i*2654435761) % 65536 - 32768)
                      for i in range(0, n) ]) AS BIGINT) AS sum_abs_amp,
      CAST(list_max([ abs((doc_id*7919 + i*2654435761) % 65536 - 32768)
                      for i in range(0, n) ]) AS BIGINT) AS peak
    FROM m"""))

  /** REAL video container decode (pure-JDK uncompressed AVI/RIFF): a
    * distributed AVI corpus is generated per doc (frame (f,x,y) a pure
    * integer function of (doc_id,f,x,y), written as standard BI_RGB
    * DIB '00db' chunks), then PARSED back — generic RIFF chunk walk,
    * BITMAPINFOHEADER from strf, bottom-up padded BGR rows — sampling
    * every 2nd frame to per-channel pixel sums. Raw DIB frames are
    * lossless, so the ORACLE REPLAYS THE SAMPLED FRAMES ARITHMETICALLY
    * from the generator formulas; the hash can only match if the real
    * container write→parse roundtrip returned the exact frames. */
  private val x_multimodal_video = Q(
    "x_multimodal_video",
    (s, d) => Multimodal.sampleAviFrames(s,
      Multimodal.aviMediaTable(s, Tables.documents(s, d)), everyK = 2).toDF(),
    Some("""WITH m AS (
      SELECT doc_id,
        CAST(doc_id % 24 + 8 AS INTEGER) AS w,
        CAST(doc_id % 16 + 8 AS INTEGER) AS ht,
        CAST(doc_id % 6 + 2 AS INTEGER) AS nf
      FROM documents),
    f AS (
      SELECT doc_id, w, ht, UNNEST(range(0, nf, 2)) AS fi FROM m)
    SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
      CAST(list_sum([ (doc_id*31 + fi*41 + (i % w)*7 + (i // w)*13) % 256
                      for i in range(0, w*ht) ]) AS BIGINT) AS sum_r,
      CAST(list_sum([ (doc_id*17 + fi*43 + (i % w)*11 + (i // w)*5) % 256
                      for i in range(0, w*ht) ]) AS BIGINT) AS sum_g,
      CAST(list_sum([ (doc_id*23 + fi*47 + (i % w)*3 + (i // w)*19) % 256
                      for i in range(0, w*ht) ]) AS BIGINT) AS sum_b
    FROM f"""))

  /** Binned range join (RangeJoin.binnedPointIntervalJoin): lineitem
    * quantities joined to overlapping half-open quantity bands derived
    * from `part` — the point-in-interval shape that a naive theta join
    * turns into a nested-loop. Bins make it a shuffled equi-join with a
    * residual filter (RangeJoinSpec pins equivalence to the naive join);
    * the oracle IS the naive BETWEEN join in DuckDB. */
  private val x_range_band_revenue = Q(
    "x_range_band_revenue",
    (s, d) => {
      val bands = Tables.part(s, d).filter(col("p_partkey") <= 20)
        .select(col("p_partkey").as("band_id"),
          (col("p_partkey").cast("double") * 2.0).as("qty_lo"),
          (col("p_partkey").cast("double") * 2.0 + 5.0).as("qty_hi"))
      RangeJoin.binnedPointIntervalJoin(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        col("l_quantity"), bands, col("qty_lo"), col("qty_hi"), binWidth = 5.0)
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_lineitems"),
          Exact.sumMoney(col("l_extendedprice")).as("band_revenue"))
    },
    Some(s"""WITH bands AS (
      SELECT p_partkey AS band_id,
        CAST(p_partkey AS DOUBLE) * 2.0 AS qty_lo,
        CAST(p_partkey AS DOUBLE) * 2.0 + 5.0 AS qty_hi
      FROM part WHERE p_partkey <= 20)
    SELECT band_id, COUNT(*) AS n_lineitems,
      ${Exact.sumMoneySql("l_extendedprice")} AS band_revenue
    FROM lineitem l JOIN bands b
      ON l.l_quantity >= b.qty_lo AND l.l_quantity < b.qty_hi
    GROUP BY 1"""))

  // ------------------------------------------------------------- events

  /** As-of join (AsofJoin.asofJoin): each click is joined to the user's
    * most recent at-or-before view — the point-in-time lookup, via the
    * scalable union+window formulation (one shuffle, no range blowup).
    * The oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, i.e. semantics are
    * pinned against an independent as-of implementation, not our own
    * SQL transliteration. (user_id, ts) is unique in testdata, so the
    * equal-ts winner is deterministic on both engines. */
  private val x_asof_clicks_views = Q(
    "x_asof_clicks_views",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      AsofJoin.asofJoin(clicks, views, Seq("user_id"), "ts")
        .select(col("event_id"), col("user_id"),
          col("view_event_id"), col("view_value"))
    },
    Some("""WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, ts, event_id AS view_event_id, value AS view_value
      FROM events WHERE event_type = 'view')
    SELECT c.event_id, c.user_id, v.view_event_id, v.view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts"""))

  /** Forward as-of: each click's NEXT purchase at-or-after it per user
    * (conversion lookup). Same union+window machinery scanning the
    * mirror direction; oracle = DuckDB ASOF with the flipped
    * inequality. */
  private val x_asof_forward_purchase = Q(
    "x_asof_forward_purchase",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_event_id"), col("value").as("purchase_value"))
      AsofJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts",
        direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("purchase_event_id"), col("purchase_value"))
    },
    Some("""WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, ts, event_id AS purchase_event_id, value AS purchase_value
      FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id, p.purchase_event_id, p.purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts"""))

  /** Funnel analysis = CHAINED forward as-of joins: each view's nearest
    * following click within 1h, then that click's nearest following
    * purchase within 1h; per-user step counts. Two keyed window
    * shuffles total — the funnel never materializes event pairs, so
    * cost stays linear in events at 100 TB. Oracle chains DuckDB ASOF
    * joins the same way. */
  private val x_events_funnel = Q(
    "x_events_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
      def typed(t: String, idAs: String, tsAs: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id"), col("ts"),
            col("event_id").as(idAs), col("ts").as(tsAs))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
      val v2c = AsofJoin.asofJoin(views,
          typed("click", "click_id", "click_ts"), Seq("user_id"), "ts",
          direction = "forward")
        .filter(col("click_ts").isNotNull &&
          col("click_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      val step2 = v2c.select(col("view_id"), col("user_id"), col("click_id"),
        col("click_ts").as("ts"))
      val v2c2p = AsofJoin.asofJoin(step2,
          typed("purchase", "purchase_id", "purchase_ts"), Seq("user_id"), "ts",
          direction = "forward")
        .filter(col("purchase_ts").isNotNull &&
          col("purchase_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      views.groupBy(col("user_id")).agg(count(lit(1)).as("n_views"))
        .join(v2c.groupBy(col("user_id")).agg(count(lit(1)).as("n_clicked")),
          Seq("user_id"), "left")
        .join(v2c2p.groupBy(col("user_id")).agg(count(lit(1)).as("n_completed")),
          Seq("user_id"), "left")
        .select(col("user_id"), col("n_views"),
          coalesce(col("n_clicked"), lit(0L)).as("n_clicked"),
          coalesce(col("n_completed"), lit(0L)).as("n_completed"))
    },
    Some("""WITH views AS (
      SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'),
    clicks AS (
      SELECT user_id, ts, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, ts, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    v2c_raw AS MATERIALIZED (
      -- MATERIALIZED: stops DuckDB pushing the later range filter into
      -- the ASOF ON-clause (it only allows ONE inequality there)
      SELECT v.view_id, v.user_id, v.ts, c.click_id, c.click_ts
      FROM views v ASOF LEFT JOIN clicks c
        ON v.user_id = c.user_id AND v.ts <= c.ts),
    v2c AS (
      SELECT view_id, user_id, click_id, click_ts FROM v2c_raw
      WHERE click_ts IS NOT NULL AND click_ts <= ts + INTERVAL 1 HOUR),
    v2c2p_raw AS MATERIALIZED (
      SELECT s.view_id, s.user_id, s.click_ts, p.purchase_id, p.purchase_ts
      FROM v2c s ASOF LEFT JOIN purchases p
        ON s.user_id = p.user_id AND s.click_ts <= p.ts),
    v2c2p AS (
      SELECT view_id, user_id, purchase_id FROM v2c2p_raw
      WHERE purchase_ts IS NOT NULL
        AND purchase_ts <= click_ts + INTERVAL 1 HOUR)
    SELECT a.user_id, a.n_views,
      coalesce(b.n_clicked, 0) AS n_clicked,
      coalesce(c.n_completed, 0) AS n_completed
    FROM (SELECT user_id, count(*) AS n_views FROM views GROUP BY 1) a
    LEFT JOIN (SELECT user_id, count(*) AS n_clicked FROM v2c GROUP BY 1) b
      ON a.user_id = b.user_id
    LEFT JOIN (SELECT user_id, count(*) AS n_completed FROM v2c2p GROUP BY 1) c
      ON a.user_id = c.user_id"""))

  /** Batch–stream PARITY, oracle-checked: the hourly aggregation runs as
    * an actual Structured Streaming query — file source → windowed
    * aggregation → Trigger.AvailableNow to completion — and the driver
    * hash-compares the STREAMING result against DuckDB's batch SQL.
    * Complete mode + memory sink materialize the full aggregate for the
    * compare (harness-only: a production run is append mode with the
    * watermark, parquet/Kafka sink — see EventStream.hourlyCounts).
    * countDistinct is excluded: distinct aggregation is unsupported in
    * streaming (approx_count_distinct is its streaming stand-in).
    * The temp-dir copy only adapts the ns-timestamp fixture to a
    * streamable µs file source (memoized per testdata dir — it is input
    * PREP, and re-writing it per invocation would bill fixture IO to
    * the streaming query under measurement); real deployments stream
    * the landing directory itself. */
  private val streamFixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val x_stream_hourly_parity = Q(
    "x_stream_hourly_parity",
    (s, d) => {
      val tmp = streamFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_stream_events")
        Tables.events(s, d).filter(col("ts").isNotNull)
          .write.mode("overwrite").parquet(t)
        t
      })
      val agg = EventStream.readEvents(s, tmp, format = "parquet")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("n_events"), col("min_value"), col("max_value"))
      val sink = "x_stream_hourly_parity_sink"
      graft.streaming.EventStream.withStatePartitions(s, 4) {
        val sq = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      s.table(sink)
    },
    Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
      count(*) AS n_events,
      min(value) AS min_value,
      max(value) AS max_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2"""))

  /** Stream-STATIC enrichment join parity: the streaming event feed
    * joined to a bounded static dimension (user → cohort) — the
    * third Structured Streaming join shape next to the stream-stream
    * interval join ([[x_stream_join_parity]]) and the stateful
    * aggregations. The static side is a plain batch DataFrame
    * broadcast under the micro-batch join (no state store: each batch
    * re-joins against the static relation — at 100 TB this is the
    * dimension-enrichment shape where only the FACT side streams).
    * Oracle is the equivalent batch join+aggregate. */
  private val x_stream_static_join = Q(
    "x_stream_static_join_parity",
    (s, d) => {
      val tmp = streamFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_stream_events")
        Tables.events(s, d).filter(col("ts").isNotNull)
          .write.mode("overwrite").parquet(t)
        t
      })
      val dim = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(7)).cast("int"))
      val agg = EventStream.readEvents(s, tmp, format = "parquet")
        .join(broadcast(dim), Seq("user_id"))
        .groupBy(col("cohort"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
      val sink = "x_stream_static_join_sink"
      graft.streaming.EventStream.withStatePartitions(s, 4) {
        val sq = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      s.table(sink)
    },
    Some("""SELECT CAST(user_id % 7 AS INTEGER) AS cohort, event_type,
      COUNT(*) AS n_events,
      MIN(event_id) AS min_event,
      MAX(event_id) AS max_event
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1, 2"""))

  /** Semi-structured path extraction — the true analogue of the
    * reference's VARIANT `value:cN` access (design.sql:142–262; our CSV
    * ingest maps it positionally, this maps it by PATH): the events
    * `props` JSON column parsed with an explicit schema-on-read
    * (from_json stays inside codegen; no UDF), extracted field
    * aggregated per event type. Integer aggregates — engine-exact. */
  private val x_events_json_props = Q(
    "x_events_json_props",
    // get_json_object + cast, not strict from_json: both engines then
    // share lenient extract-text-then-cast semantics (string-encoded
    // numbers coerce, malformed values null) instead of Spark's strict
    // schema-on-read nulling what DuckDB coerces.
    (s, d) => Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")),
    // CAST(SUM(...) AS BIGINT): DuckDB SUM(INTEGER) is HUGEINT, Spark is
    // LongType — the driver hash compare is dtype-sensitive.
    Some("""SELECT event_type, COUNT(*) AS n_events,
      COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k,
      MIN(k) AS min_k, MAX(k) AS max_k
    FROM (SELECT event_type,
            TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events)
    GROUP BY 1"""))

  /** Volume-anomaly detection: hours whose event count sits ≥2σ from
    * their event type's mean hourly volume. Statistics are exact —
    * counts and their squares are integer sums (no decimal machinery
    * needed), the closing z-score is the same IEEE double sequence on
    * both engines, rounded to 6dp. Two shuffles total: the hourly
    * aggregate, then one window over the per-type series (≤ |types| ×
    * |hours| rows — never fact volume). */
  private val x_events_anomaly = Q(
    "x_events_anomaly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type"))
      val nH = count(lit(1)).over(w)
      val sc = sum(col("n_events")).over(w)
      val sc2 = sum(col("n_events") * col("n_events")).over(w)
      hourly
        .withColumn("mean_events",
          round(sc.cast("double") / nH, 6))
        .withColumn("__nh", nH)
        .withColumn("__var",
          (sc2.cast("double") - sc.cast("double") * sc.cast("double") / nH)
            / (nH - 1))
        // nH > 1 guard: a type with one hour gives 0.0/0 = NaN, and NaN
        // compares greater-than-everything in Spark — without the guard a
        // spurious NaN-z row escapes the __var > 0 filter.
        .withColumn("z_score",
          when(col("__nh") > lit(1L) && col("__var") > 0.0, round(
            (col("n_events").cast("double")
              - sc.cast("double") / nH) / sqrt(col("__var")), 6)))
        .filter(abs(col("z_score")) >= 2.0)
        .select(col("event_type"), col("hour_start"), col("n_events"),
          col("mean_events"), col("z_score"))
    },
    Some("""WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
        COUNT(*) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2),
    stats AS (
      SELECT *,
        COUNT(*) OVER w AS n_h,
        SUM(n_events) OVER w AS sc,
        SUM(n_events * n_events) OVER w AS sc2
      FROM hourly
      WINDOW w AS (PARTITION BY event_type)),
    scored AS (
      SELECT event_type, hour_start, n_events,
        ROUND(CAST(sc AS DOUBLE) / n_h, 6) AS mean_events,
        CASE WHEN n_h > 1
                  AND (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_h)
                  / (n_h - 1) > 0.0 THEN
          ROUND((CAST(n_events AS DOUBLE) - CAST(sc AS DOUBLE) / n_h)
            / sqrt((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n_h)
                   / (n_h - 1)), 6)
        END AS z_score
      FROM stats)
    SELECT event_type, hour_start, n_events, mean_events, z_score
    FROM scored WHERE abs(z_score) >= 2.0"""))

  /** Cohort retention matrix: users grouped by first-active week, count
    * of distinct active users per (cohort, activity week), plus the
    * retention rate against the cohort's own first week (weekly grain:
    * the events fixture spans ~1 month; both engines truncate weeks to
    * Monday). Two shuffles
    * on user_id (distinct month-activity + first-seen), then the rate
    * window runs over the tiny aggregated matrix — fact-table volume
    * never reaches a window. */
  /** Event-type co-occurrence with lift — the market-basket
    * "users who do X also do Y" primitive: per-user DISTINCT type sets,
    * type-pair user counts, lift = P(a,b)/(P(a)·P(b)) over the user
    * universe. The per-user self-join fans out ≤ |types|² rows per
    * user (types are a bounded vocabulary), and every aggregate is
    * combinable — output is |types|² rows at any corpus size. */
  private val x_events_cooccur = Q(
    "x_events_cooccur",
    (s, d) => {
      val ut = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("event_type")).distinct()
      val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      val nu = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
        .join(ut.select(col("user_id"), col("event_type").as("type_b")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(totals.select(col("event_type").as("type_a"),
          col("n_t").as("n_a"))), Seq("type_a"))
        .join(broadcast(totals.select(col("event_type").as("type_b"),
          col("n_t").as("n_b"))), Seq("type_b"))
        .crossJoin(broadcast(nu))
        .select(col("type_a"), col("type_b"), col("n_both"),
          col("n_a"), col("n_b"),
          round((col("n_both").cast("double") * col("n_users")) /
            (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
    },
    Some("""WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    totals AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id
        AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_both, ta.n_t AS n_a, tb.n_t AS n_b,
      ROUND((CAST(n_both AS DOUBLE) * n_users) /
            (CAST(ta.n_t AS DOUBLE) * tb.n_t), 6) AS lift
    FROM pairs
    JOIN totals ta ON ta.event_type = type_a
    JOIN totals tb ON tb.event_type = type_b
    CROSS JOIN nu"""))

  /** First-order Markov transition matrix over each user's event
    * sequence: LAG pairs per user (one window pass), combinable pair
    * counts, per-source row normalization in integer micro —
    * the session-model summary (next-action prediction, anomaly
    * scoring) whose output is |types|² however large the corpus. */
  private val x_events_markov = Q(
    "x_events_markov",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("event_id"),
          date_trunc("second", col("ts")).as("ts_s"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      val trans = e
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTotals = trans.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      trans.join(broadcast(fromTotals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n") * lit(1e6) / col("n_from")).cast("long")
            .as("p_micro"))
    },
    Some("""WITH e AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS ts_s, event_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    seq AS (
      SELECT event_type AS from_type,
        LEAD(event_type) OVER (PARTITION BY user_id
          ORDER BY ts_s, event_id) AS to_type
      FROM e),
    trans AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
    ft AS (SELECT from_type, SUM(n) AS n_from FROM trans GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n,
      CAST(ROUND(t.n * 1e6 / f.n_from) AS BIGINT) AS p_micro
    FROM trans t JOIN ft f ON t.from_type = f.from_type"""))

  private val x_events_retention = Q(
    "x_events_retention",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val active = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
        .distinct()
      val cohort = active.groupBy(col("user_id"))
        .agg(min(col("active_week")).as("cohort_week"))
      val matrix = active.join(cohort, "user_id")
        .groupBy(col("cohort_week"), col("active_week"))
        .agg(count(lit(1)).as("n_active")) // distinct by construction
      val wC = Window.partitionBy(col("cohort_week"))
      matrix.withColumn("cohort_size",
          max(when(col("active_week") === col("cohort_week"), col("n_active")))
            .over(wC))
        .withColumn("retention_pct",
          round(col("n_active").cast("double") / col("cohort_size").cast("double")
            * 100.0, 2))
    },
    Some("""WITH active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events WHERE ts IS NOT NULL),
    cohort AS (
      SELECT user_id, min(active_week) AS cohort_week
      FROM active GROUP BY 1),
    matrix AS (
      SELECT c.cohort_week, a.active_week, count(*) AS n_active
      FROM active a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY 1, 2)
    SELECT cohort_week, active_week, n_active,
      MAX(CASE WHEN active_week = cohort_week THEN n_active END)
        OVER (PARTITION BY cohort_week) AS cohort_size,
      ROUND(CAST(n_active AS DOUBLE)
        / CAST(MAX(CASE WHEN active_week = cohort_week THEN n_active END)
            OVER (PARTITION BY cohort_week) AS DOUBLE) * 100.0, 2) AS retention_pct
    FROM matrix"""))

  /** Behavioral path mining: the 20 most common 3-step event-type
    * sequences across all user journeys — the "what do users do next"
    * analysis every product-events warehouse runs. Per-user ordering is
    * (ts, event_id) so ties inside one timestamp are deterministic;
    * trigrams come from two LEADs over ONE window spec (one shuffle on
    * user_id, both leads evaluated in the same window pass), tails with
    * fewer than 3 events are dropped via null-propagating concat
    * semantics (explicit IS NOT NULL on both leads — concat_ws would
    * silently shrink tail trigrams to 2-grams). The global top-20 runs
    * on the tiny path-count aggregate: TakeOrderedAndProject, rank
    * window over 20 rows only. */
  private val x_events_paths = Q(
    "x_events_paths",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val seq = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
      val cnt = seq
        .select(concat(col("event_type"), lit(">"), col("e2"),
          lit(">"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
      val wr = Window.orderBy(col("n").desc, col("path"))
      cnt.withColumn("rank", row_number().over(wr).cast("int"))
    },
    Some("""WITH seq AS (
      SELECT event_type,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    cnt AS (
      SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1)
    SELECT path, n,
      CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INTEGER) AS rank
    FROM cnt
    QUALIFY rank <= 20"""))

  /** Tumbling 1-hour window aggregate over the event stream (batch form
    * of the Structured Streaming windowed agg — see streaming package). */
  private val x_events_hourly = Q(
    "x_events_hourly",
    // explicit ts IS NOT NULL on BOTH sides: Spark's window() injects the
    // filter implicitly (NULL-ts rows vanish) while date_trunc groups
    // them under NULL — pin one semantics so the engines cannot diverge
    (s, d) => Tables.events(s, d)
      .filter(col("ts").isNotNull)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value")),
    Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
      count(*) AS n_events,
      count(DISTINCT user_id) AS n_users,
      min(value) AS min_value,
      max(value) AS max_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2"""))

  /** Sessionization: 30-minute-gap sessions per user via running-sum
    * window (the batch analog of mapGroupsWithState sessionization).
    * Timestamps are second-truncated on both sides so ns-vs-us parquet
    * precision cannot perturb the compare. */
  private val x_events_sessionize = Q(
    "x_events_sessionize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // Total order (ts_s, event_id): same-second ties would otherwise
      // make LAG/running-sum nondeterministic across engines.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
      val gap = col("ts_s").cast("double") - lag(col("ts_s"), 1).over(w).cast("double")
      val isNew = when(gap.isNull || gap > 1800.0, 1L).otherwise(0L)
      // ts IS NOT NULL pinned on both sides: Spark windows order NULLS
      // FIRST, DuckDB NULLS LAST — NULL timestamps would renumber every
      // session in the partition differently across engines.
      Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("event_id"), date_trunc("second", col("ts")).as("ts_s"))
        .withColumn("session_id",
          sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_s")).as("session_start"),
          max(col("ts_s")).as("session_end"))
    },
    Some("""WITH e AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS ts_s
      FROM events WHERE ts IS NOT NULL),
    flagged AS (
      SELECT user_id, event_id, ts_s,
        CASE WHEN LAG(ts_s) OVER w IS NULL
               OR epoch(ts_s) - epoch(LAG(ts_s) OVER w) > 1800.0
             THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
    sessions AS (
      SELECT user_id, ts_s,
        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
      count(*) AS n_events,
      min(ts_s) AS session_start,
      max(ts_s) AS session_end
    FROM sessions
    GROUP BY 1, 2"""))

  /** Streaming-vs-batch SESSIONIZE parity on the custom-state path: the
    * flatMapGroupsWithState sessionizer (EventStream.sessionize — one
    * open session per user in the state store, event-time timeouts) run
    * with Trigger.AvailableNow over the events fixture, oracle-compared
    * against DuckDB's gaps-and-islands sessionization. The fixture is
    * coalesced to ONE file so the run is exactly one data micro-batch
    * (watermark still unset, so nothing times out mid-stream) followed
    * by the no-data batch that fires event-time timeouts at the final
    * watermark. Emission rule replayed by the oracle: a session closed
    * by a later same-user event always emits; the user's LAST session
    * emits iff its timeout timestamp passed the final watermark
    * strictly — end + gap < max(ts) over the whole input (Spark times
    * out state when timeoutTimestamp < watermark). */
  /** Temp fixture dir registered for recursive deletion at JVM exit:
    * a bench/verify run at large SF writes hundreds of MB of stream
    * fixtures (the 100× corpus leaves ~400 MB), and without the hook
    * they accumulate in java.io.tmpdir across runs on a shared host.
    * (File.deleteOnExit only removes EMPTY dirs, hence the hook.) */
  private[queries] def fixtureTempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p.toString
  }

  private val sessionParityFixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val x_stream_sessionize_parity = Q(
    "x_stream_sessionize_parity",
    (s, d) => {
      import s.implicits._
      val tmp = sessionParityFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_stream_sess")
        Tables.events(s, d).filter(col("ts").isNotNull)
          // second-truncated on both sides, same as x_events_sessionize
          .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
            col("user_id"))
          .coalesce(1)
          .write.mode("overwrite").parquet(t)
        t
      })
      val ev = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .parquet(tmp)
        .as[EventStream.Event]
      val sink = "x_stream_sessionize_parity_sink"
      graft.streaming.EventStream.withStatePartitions(s, 4) {
        val sq = EventStream.sessionize(s, ev)
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      s.table(sink).select(col("user_id"), col("n_events"),
        timestamp_millis(col("start_ms")).as("session_start"),
        timestamp_millis(col("end_ms")).as("session_end"))
    },
    Some("""WITH e AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS ts_s
      FROM events WHERE ts IS NOT NULL),
    flagged AS (
      SELECT user_id, event_id, ts_s,
        CASE WHEN LAG(ts_s) OVER w IS NULL
               OR epoch(ts_s) - epoch(LAG(ts_s) OVER w) > 1800.0
             THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
    sessions AS (
      SELECT user_id, ts_s,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    agg AS (
      SELECT user_id, session_id, count(*) AS n_events,
        min(ts_s) AS session_start, max(ts_s) AS session_end
      FROM sessions GROUP BY 1, 2),
    ranked AS (
      SELECT *, max(session_id) OVER (PARTITION BY user_id) AS last_sid
      FROM agg),
    mx AS (SELECT max(ts_s) AS max_ts FROM e)
    SELECT user_id, n_events, session_start, session_end
    FROM ranked, mx
    WHERE session_id < last_sid
       OR epoch(session_end) + 1800.0 < epoch(max_ts)"""))

  /** transformWithState (Spark 4's arbitrary-state API, RocksDB-backed)
    * parity: the per-user lifetime counter run via AvailableNow over the
    * same one-file fixture — a single batch, so each user's ONE emitted
    * update-mode row is their total count — oracle-compared to a plain
    * GROUP BY. The RocksDB provider requirement is scoped to this query
    * and restored after, so the fMGWS/aggregation streaming queries keep
    * their default provider. */
  private val x_stream_tws_counts = Q(
    "x_stream_tws_counts",
    (s, d) => {
      import s.implicits._
      val tmp = sessionParityFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_stream_sess")
        Tables.events(s, d).filter(col("ts").isNotNull)
          .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
            col("user_id"))
          .coalesce(1)
          .write.mode("overwrite").parquet(t)
        t
      })
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val ev = s.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
          .parquet(tmp)
          .as[EventStream.Event]
        val sink = "x_stream_tws_counts_sink"
        graft.streaming.EventStream.withStatePartitions(s, 4) {
          val sq = EventStream.runningUserCounts(s, ev)
            .writeStream.format("memory").queryName(sink)
            .outputMode("update")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
        s.table(sink).groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"))
      } finally prev match {
        case Some(p) => s.conf.set(provKey, p)
        case None    => s.conf.unset(provKey)
      }
    },
    Some("""SELECT user_id, COUNT(*) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1"""))

  /** ORC source/sink roundtrip — the second columnar interchange format
    * (reader/writer ship inside spark-sql). lineitem's money columns,
    * timestamps and flags written as ORC, read back, and aggregated with
    * the q_a1 exact-decimal discipline; the oracle aggregates the
    * parquet ORIGINALS, so any type/precision loss in the ORC hop
    * breaks the hash match. */
  private val x_source_orc = Q(
    "x_source_orc_roundtrip",
    (s, d) => {
      val path = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_orc_roundtrip").getPath
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          Exact.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          count(lit(1)).as("n_rows"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      SUM(l_quantity) AS sum_qty,
      ${Exact.sumMoneySql("l_extendedprice")} AS sum_base_price,
      ${Exact.sumRevenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
      min(l_shipdate) AS min_ship,
      max(l_shipdate) AS max_ship,
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY 1, 2"""))

  /** Sketch aggregates — the mergeable-summary tier a 100 TB engine
    * leans on when exact distinct-counting would shuffle every key:
    * HyperLogLog++ (approx_count_distinct), an Apache DataSketches HLL
    * built per-group and estimated (hll_sketch_agg — the sketch BYTES
    * are mergeable across partitions/days, which is the real point),
    * and approx_percentile. Approximate values can't hash-match another
    * engine, so the query emits exact anchors plus BOUND CHECKS the
    * oracle asserts as literal TRUE: HLL estimates within 3x the
    * default rsd, and the percentile's RANK (tie-robust: count(<x) /
    * count(<=x) brackets) within n/accuracy + 1 of the true median
    * rank — the GK-sketch guarantee. A drifting sketch implementation
    * flips a boolean and the driver compare goes red. */
  private val x_sketch_suite = Q(
    "x_sketch_suite",
    (s, d) => {
      def base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_custkey"), col("o_totalprice"))
      val agg = base.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_cust_exact"),
          approx_count_distinct(col("o_custkey")).as("acd"),
          hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("hll"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"))
      // rank-check pass: rebuild the base (no shared-lineage self-join)
      // and count rows strictly-below / at-or-below each nation's p50
      val p50s = agg.select(col("nation").as("p50_nation"), col("p50"))
      val ranks = base.join(broadcast(p50s), col("nation") === col("p50_nation"))
        .groupBy(col("nation"))
        .agg(count(when(col("o_totalprice") < col("p50"), 1)).as("n_lt"),
          count(when(col("o_totalprice") <= col("p50"), 1)).as("n_le"))
      val eps = col("n_orders").cast("double") / 1000.0 + 1.0
      val mid = col("n_orders").cast("double") / 2.0
      agg.join(ranks, "nation")
        .select(col("nation"), col("n_orders"), col("n_cust_exact"),
          (abs(col("acd").cast("double") - col("n_cust_exact").cast("double"))
            <= col("n_cust_exact").cast("double") * 0.15).as("acd_ok"),
          (abs(col("hll").cast("double") - col("n_cust_exact").cast("double"))
            <= col("n_cust_exact").cast("double") * 0.15).as("hll_ok"),
          (col("n_le").cast("double") >= mid - eps
            && col("n_lt").cast("double") <= mid + eps).as("p50_ok"))
    },
    Some("""SELECT n_name AS nation,
      COUNT(*) AS n_orders,
      COUNT(DISTINCT o_custkey) AS n_cust_exact,
      true AS acd_ok, true AS hll_ok, true AS p50_ok
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1"""))

  /** Edit-distance (Levenshtein ≤ 4) near-dup pairs over 48-char
    * document prefixes — the character-level dedup signal that
    * shingle/Jaccard methods miss (small in-place edits barely move an
    * edit distance but can flip many shingles).
    *
    * Blocking is PassJoin-style pigeonhole segmenting (Li et al.,
    * EDBT'11), NOT length bucketing: split each indexed prefix into
    * k+1 = 5 fixed segments; an edit script of ≤ k = 4 operations
    * cannot touch all 5, so for any qualifying pair the probe string
    * CONTAINS one segment verbatim, position-shifted by at most the
    * preceding indels (|δ| ≤ 4). The probe side therefore emits each
    * segment window at shifts −4…+4 and the join is a plain equi-join
    * on (lang, segment_idx, segment_text) — lossless by pigeonhole.
    * This matters at scale: a length-bucket scheme has a BOUNDED key
    * domain, so its per-bucket density — and candidate volume — grows
    * with corpus² (measured: 78× wall-clock at 10× rows); segment
    * keys grow WITH the corpus, so candidates track true content
    * collisions (measured ~24× fewer slots at 10×). A pair can match
    * several segments, so candidates are deduped BEFORE the DP —
    * the distance runs once per pair, in the THRESHOLD form of
    * levenshtein (banded DP, O(k·len), −1 past the bound). The oracle
    * replays the identical segmenting/shift generation and recomputes
    * the full distance for every emitted pair, so both the candidate
    * set and the scores are value-checked. */
  private val x_dedup_editdist = Q(
    "x_dedup_editdist",
    (s, d) => {
      val segs = Seq((0, 1, 10), (1, 11, 10), (2, 21, 10), (3, 31, 9), (4, 40, 9))
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 48).as("pfx"))
      val idx = docs.select(col("doc_id"), col("lang"), col("pfx"),
        explode(array(segs.map { case (i, st, ln) =>
          struct(lit(i).as("i"), substring(col("pfx"), st, ln).as("seg"))
        }: _*)).as("k"))
        .select(col("doc_id"), col("lang"), col("pfx"),
          col("k.i").as("i"), col("k.seg").as("seg"))
      val shifted = for {
        (i, st, ln) <- segs; dlt <- -4 to 4; if st + dlt >= 1
      } yield (i, st + dlt, ln)
      val probe = docs.select(col("doc_id").as("doc_b"),
        col("lang").as("lang_p"), col("pfx").as("pfx_b"),
        explode(array(shifted.map { case (i, p, ln) =>
          struct(lit(i).as("i"), substring(col("pfx"), p, ln).as("seg"))
        }: _*)).as("k"))
        .select(col("doc_b"), col("lang_p"), col("pfx_b"),
          col("k.i").as("i_p"), col("k.seg").as("seg_p"))
      idx.join(probe,
          col("lang") === col("lang_p") && col("i") === col("i_p") &&
            col("seg") === col("seg_p") && col("doc_id") < col("doc_b"))
        .select(col("doc_id").as("doc_a"), col("doc_b"),
          col("pfx"), col("pfx_b"))
        .dropDuplicates("doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("pfx"), col("pfx_b"), 4).as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 4)
    },
    Some("""WITH d AS (
      SELECT doc_id, lang, substring(text, 1, 48) AS pfx
      FROM documents WHERE text IS NOT NULL),
    segs AS (SELECT * FROM (VALUES (0, 1, 10), (1, 11, 10), (2, 21, 10),
                                   (3, 31, 9), (4, 40, 9)) s(i, st, ln)),
    idx AS (
      SELECT doc_id, lang, pfx, i, substring(pfx, st, ln) AS seg
      FROM d, segs),
    probe AS (
      SELECT doc_id, lang, pfx, i, substring(pfx, st + delta, ln) AS seg
      FROM d, segs, range(-4, 5) t(delta)
      WHERE st + delta >= 1),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, p.doc_id AS doc_b,
        a.pfx AS pfx_a, p.pfx AS pfx_b
      FROM idx a JOIN probe p
        ON a.lang = p.lang AND a.i = p.i AND a.seg = p.seg
          AND a.doc_id < p.doc_id)
    SELECT doc_a, doc_b, CAST(levenshtein(pfx_a, pfx_b) AS INTEGER) AS dist
    FROM cands WHERE levenshtein(pfx_a, pfx_b) <= 4"""))

  /** Entity resolution: blocked BEST-MATCH assignment on the part
    * catalog via the native codegen [[graft.functions.JaroWinkler]]
    * expression — the canonical record-linkage shape (Fellegi-Sunter
    * style candidate generation + fuzzy-score ranking). Blocking key is
    * (brand, size, first name token): candidates are an equi-join on the
    * block, never all-pairs, so pair volume is Σ|block|² with block
    * sizes held small by the three-attribute key (max block 10 at
    * sf0.1). Per entity the single best candidate wins (rounded-score
    * desc, id asc — rounding BEFORE ranking keeps both engines' order
    * identical), giving output bounded by the entity count. The oracle
    * recomputes every score with DuckDB's own `jaro_winkler_similarity`
    * — the kernel was validated byte-for-byte against it (byte-level
    * match window, either-empty → 0, 0.7 boost threshold), so this row
    * set cross-checks two INDEPENDENT implementations of the metric. */
  /** Soundex phonetic-blocking profile ([[Phonetic.soundex]]) over the
    * distinct part-name vocabulary: each token's American Soundex code
    * (with the h/w transparency rule) and the resulting bucket sizes —
    * the blocking-key audit an ER pipeline runs before choosing
    * phonetic blocking (bucket counts ≈ candidate-pair volume). The
    * oracle replays the strip/collapse array pipeline index-for-index
    * with DuckDB list comprehensions — two independent Soundex
    * implementations cross-checked on the full vocabulary. Vocabulary-
    * bounded after the distinct; the encode itself is per-row
    * codegen'd native functions, no UDF. */
  private val x_er_soundex = Q(
    "x_er_soundex",
    (s, d) => {
      val toks = Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("w")).distinct()
      toks.withColumn("sx", Phonetic.soundex(col("w")))
        .filter(col("sx").isNotNull)
        .groupBy(col("sx"))
        .agg(count(lit(1)).as("n_tokens"), min(col("w")).as("first_token"))
    },
    Some(s"""WITH tok AS (
      SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part),
    ${Phonetic.soundexSqlCtes("tok", "w")}
    SELECT sx, COUNT(*) AS n_tokens, MIN(w) AS first_token
    FROM __sx_out WHERE sx IS NOT NULL
    GROUP BY 1"""))

  private val x_er_jarowinkler = Q(
    "x_er_jarowinkler",
    (s, d) => {
      // Collapse-exact-first (same discipline as [[x_er_golden]]): the
      // Jaro-Winkler pair join runs between DISTINCT (name,brand,size)
      // records, so pair volume scales with distinct entities, not
      // (duplicates/record)². Per-part best-match semantics are
      // preserved EXACTLY: a member of an exact-duplicate group can
      // only be best-matched within its group (JW=1.0, unreachable
      // cross-group) at the group's smallest other key; a singleton
      // takes its group's rep-level best cross match (per-group sim is
      // name-constant, and the tied-group min rep IS the min candidate
      // key). The pre-collapse form measured >10 min at the 100× step —
      // a replicated corpus is exactly the adversarial duplicate mass.
      val parts = Tables.part(s, d).select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        split(col("p_name"), " ").getItem(0).as("w1"))
      val g1 = parts.groupBy(col("p_name"), col("p_brand"), col("p_size"), col("w1"))
        .agg(min(col("p_partkey")).as("rep_id"), count(lit(1)).as("gn"))
      val g2 = parts
        .join(g1.select(col("p_name"), col("p_brand"), col("p_size"), col("rep_id")),
          Seq("p_name", "p_brand", "p_size"))
        .filter(col("p_partkey") =!= col("rep_id"))
        .groupBy(col("p_name"), col("p_brand"), col("p_size"))
        .agg(min(col("p_partkey")).as("rep2_id"))
      val groups = g1.join(g2, Seq("p_name", "p_brand", "p_size"), "left")
      val la = groups.select(col("rep_id").as("ga"), col("p_name").as("name_a"),
        col("p_brand").as("brand_a"), col("p_size").as("size_a"), col("w1").as("w1_a"))
      val lb = groups.select(col("rep_id").as("gb"), col("p_name").as("name_b"),
        col("p_brand").as("brand_b"), col("p_size").as("size_b"), col("w1").as("w1_b"))
      val wBest = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ga")).orderBy(col("sim").desc, col("gb"))
      val bestCross = la.join(lb,
          col("brand_a") === col("brand_b") && col("size_a") === col("size_b") &&
            col("w1_a") === col("w1_b") && col("ga") =!= col("gb"))
        .withColumn("sim",
          round(graft.functions.GraftFunctions.jaroWinkler(col("name_a"), col("name_b")), 6))
        .filter(col("sim") >= 0.88)
        .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
        .select(col("ga"), col("gb").as("cross_match"), col("sim").as("cross_sim"))
      parts
        .join(groups.select(col("p_name"), col("p_brand"), col("p_size"),
          col("rep_id"), col("gn"), col("rep2_id")),
          Seq("p_name", "p_brand", "p_size"))
        .join(bestCross, col("rep_id") === col("ga"), "left")
        .select(col("p_partkey").as("entity_id"),
          when(col("gn") >= 2,
            when(col("p_partkey") === col("rep_id"), col("rep2_id"))
              .otherwise(col("rep_id")))
            .otherwise(col("cross_match")).as("match_id"),
          when(col("gn") >= 2, lit(1.0)).otherwise(col("cross_sim")).as("sim"))
        .filter(col("match_id").isNotNull)
    },
    Some("""WITH p AS (
      SELECT p_partkey, p_name, p_brand, p_size,
             split_part(p_name, ' ', 1) AS w1
      FROM part),
    pairs AS (
      SELECT a.p_partkey AS entity_id, b.p_partkey AS match_id,
             ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.w1 = b.w1
          AND a.p_partkey <> b.p_partkey
      WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.88)
    SELECT entity_id, match_id, sim FROM pairs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY sim DESC, match_id) = 1"""))

  /** Fellegi–Sunter probabilistic record linkage (the 1969 model under
    * Splink/RecordLinkage-style ER): candidate pairs from blocking,
    * per-field agreement patterns, log-likelihood match weights
    * w = ln(m/u) on agreement and ln((1−m)/(1−u)) on disagreement, and
    * a three-way link / possible / non-link decision on the summed
    * weight. m-probabilities are fixed literals (the usual cold-start
    * choice before EM); u-probabilities — P(agree | random pair) — are
    * ESTIMATED FROM THE DATA exactly as Σ_v n_v²/N² per field, each an
    * exact-integer Σn_v² over a combinable value-count aggregate.
    * Weights follow the one-transcendental-then-micro-quantize
    * discipline (ln once, ROUND(·10⁶), integer sums after), so the
    * pair scores and the decision are exact integer arithmetic.
    *
    * Scale shape (the x_er_jarowinkler lesson): pairs are enumerated
    * between DISTINCT (block, compared-fields) combos — multiplicity
    * carried as a count, within-combo pairs counted n(n−1)/2 in closed
    * form — so pair volume scales with the SATURATING attribute
    * vocabulary, not (duplicates/record)². Output is the bounded
    * 3-row classification rollup (pair counts and score range). */
  private val x_er_fellegi_sunter = Q(
    "x_er_fellegi_sunter",
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"), col("p_size"), col("p_type"),
        // coalesce to '' so a <2-word name matches DuckDB split_part
        // semantics ('' = '' is AGREEMENT there; a Spark NULL token
        // would silently fall to the disagreement weight)
        coalesce(split(col("p_name"), " ").getItem(0), lit(""))
          .as("w1"),
        coalesce(split(col("p_name"), " ").getItem(1), lit(""))
          .as("w2"))
      def s2(c: String): org.apache.spark.sql.DataFrame = p.groupBy(col(c))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt") * col("cnt")).cast("long").as(s"s2_$c"))
      val consts = p.agg(count(lit(1)).cast("long").as("n"))
        .crossJoin(s2("p_type")).crossJoin(s2("w1")).crossJoin(s2("w2"))
      def wAgree(m: String, s2c: String) =
        s"CAST(ROUND(LN(CAST('$m' AS DOUBLE) / (CAST($s2c AS DOUBLE)" +
          s" / (CAST(n AS DOUBLE) * n))) * 1000000) AS BIGINT)"
      def wDis(oneMinusM: String, s2c: String) =
        s"CAST(ROUND(LN(CAST('$oneMinusM' AS DOUBLE) / (CAST(1 AS DOUBLE)" +
          s" - CAST($s2c AS DOUBLE) / (CAST(n AS DOUBLE) * n))) * 1000000)" +
          " AS BIGINT)"
      val weights = consts.select(
        expr(wAgree("0.9", "s2_p_type")).as("wa_t"),
        expr(wDis("0.1", "s2_p_type")).as("wd_t"),
        expr(wAgree("0.95", "s2_w1")).as("wa_w"),
        expr(wDis("0.05", "s2_w1")).as("wd_w"),
        expr(wAgree("0.85", "s2_w2")).as("wa_v"),
        expr(wDis("0.15", "s2_w2")).as("wd_v"))
      val combos = p
        .groupBy(col("p_brand"), col("p_size"), col("p_type"),
          col("w1"), col("w2"))
        .agg(count(lit(1)).cast("long").as("cn"),
          min(col("p_partkey")).as("rep"))
      val a = combos.select(col("p_brand"), col("p_size"),
        col("p_type").as("t_a"), col("w1").as("w_a"), col("w2").as("v_a"),
        col("cn").as("n_a"), col("rep").as("rep_a"))
      val b = combos.select(col("p_brand"), col("p_size"),
        col("p_type").as("t_b"), col("w1").as("w_b"), col("w2").as("v_b"),
        col("cn").as("n_b"), col("rep").as("rep_b"))
      val cross = a.join(b, Seq("p_brand", "p_size"))
        .filter(col("rep_a") < col("rep_b"))
        .crossJoin(broadcast(weights))
        .select(
          (col("n_a") * col("n_b")).as("np"),
          (when(col("t_a") === col("t_b"), col("wa_t")).otherwise(col("wd_t"))
            + when(col("w_a") === col("w_b"), col("wa_w")).otherwise(col("wd_w"))
            + when(col("v_a") === col("v_b"), col("wa_v")).otherwise(col("wd_v")))
            .as("score_micro"))
      val within = combos.filter(col("cn") >= 2)
        .crossJoin(broadcast(weights))
        .select(expr("cn * (cn - 1) DIV 2").as("np"),
          (col("wa_t") + col("wa_w") + col("wa_v")).as("score_micro"))
      cross.unionByName(within)
        .withColumn("classification",
          when(col("score_micro") >= 2000000L, "link")
            .when(col("score_micro") <= 0L, "non_link")
            .otherwise("possible"))
        .groupBy(col("classification"))
        .agg(sum(col("np")).cast("long").as("n_pairs"),
          min(col("score_micro")).as("min_score_micro"),
          max(col("score_micro")).as("max_score_micro"))
    },
    Some("""WITH p AS (
      SELECT p_partkey, p_brand, p_size, p_type,
        split_part(p_name, ' ', 1) AS w1,
        split_part(p_name, ' ', 2) AS w2
      FROM part),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
    s2t AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2_p_type
      FROM (SELECT COUNT(*) AS c FROM p GROUP BY p_type)),
    s2w AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2_w1
      FROM (SELECT COUNT(*) AS c FROM p GROUP BY w1)),
    s2v AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2_w2
      FROM (SELECT COUNT(*) AS c FROM p GROUP BY w2)),
    w AS (
      SELECT
        CAST(ROUND(LN(CAST('0.9' AS DOUBLE) / (CAST(s2_p_type AS DOUBLE)
          / (CAST(n AS DOUBLE) * n))) * 1000000) AS BIGINT) AS wa_t,
        CAST(ROUND(LN(CAST('0.1' AS DOUBLE) / (CAST(1 AS DOUBLE)
          - CAST(s2_p_type AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
          * 1000000) AS BIGINT) AS wd_t,
        CAST(ROUND(LN(CAST('0.95' AS DOUBLE) / (CAST(s2_w1 AS DOUBLE)
          / (CAST(n AS DOUBLE) * n))) * 1000000) AS BIGINT) AS wa_w,
        CAST(ROUND(LN(CAST('0.05' AS DOUBLE) / (CAST(1 AS DOUBLE)
          - CAST(s2_w1 AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
          * 1000000) AS BIGINT) AS wd_w,
        CAST(ROUND(LN(CAST('0.85' AS DOUBLE) / (CAST(s2_w2 AS DOUBLE)
          / (CAST(n AS DOUBLE) * n))) * 1000000) AS BIGINT) AS wa_v,
        CAST(ROUND(LN(CAST('0.15' AS DOUBLE) / (CAST(1 AS DOUBLE)
          - CAST(s2_w2 AS DOUBLE) / (CAST(n AS DOUBLE) * n)))
          * 1000000) AS BIGINT) AS wd_v
      FROM tot CROSS JOIN s2t CROSS JOIN s2w CROSS JOIN s2v),
    pairs AS (
      SELECT
        (CASE WHEN a.p_type = b.p_type THEN wa_t ELSE wd_t END)
        + (CASE WHEN a.w1 = b.w1 THEN wa_w ELSE wd_w END)
        + (CASE WHEN a.w2 = b.w2 THEN wa_v ELSE wd_v END) AS score_micro
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
          AND a.p_partkey < b.p_partkey
      CROSS JOIN w)
    SELECT
      CASE WHEN score_micro >= 2000000 THEN 'link'
        WHEN score_micro <= 0 THEN 'non_link'
        ELSE 'possible' END AS classification,
      CAST(COUNT(*) AS BIGINT) AS n_pairs,
      CAST(MIN(score_micro) AS BIGINT) AS min_score_micro,
      CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
    FROM pairs
    GROUP BY 1"""))

  /** Entity resolution END-TO-END: the [[x_er_jarowinkler]] match graph
    * (blocked Jaro-Winkler pairs, a < b) closed into entity CLUSTERS by
    * [[Dedup.connectedComponents]], then collapsed to one GOLDEN RECORD
    * per entity by survivorship (longest name, ties to the smallest
    * key; max price; member count) — the full record-linkage pipeline a
    * master-data system runs: block → score → cluster → merge.
    * Singletons keep themselves as their cluster. The oracle replays
    * the scoring with DuckDB's independent jaro_winkler_similarity, the
    * clustering with a recursive transitive closure, and the
    * survivorship with a ranked window. */
  private val x_er_golden = Q(
    "x_er_golden_record",
    (s, d) => {
      // COLLAPSE-EXACT-FIRST (the Dedup entry-point discipline): parts
      // sharing (name, brand, size) collapse to one representative
      // (min key) BEFORE the quadratic match-graph stage, so
      // Jaro-Winkler pair volume scales with DISTINCT records — a
      // corpus that is 100× exact duplicates costs the same match
      // graph, not 10,000× the pairs (the pre-collapse form measured
      // >10 min at the 100× step). Result-identical: exact duplicates
      // share a rep (JW(name,name)=1.0 would have clustered them
      // anyway), and the cluster label — min rep id = min member key —
      // is the label the uncollapsed graph produces.
      val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_brand"), col("p_size"), col("p_retailprice"))
      val reps = parts.groupBy(col("p_name"), col("p_brand"), col("p_size"))
        .agg(min(col("p_partkey")).as("rep_id"))
        .withColumn("w1", split(col("p_name"), " ").getItem(0))
      val left = reps.select(col("rep_id").as("entity_a"), col("p_name").as("name_a"),
        col("p_brand").as("brand_a"), col("p_size").as("size_a"), col("w1").as("w1_a"))
      val right = reps.select(col("rep_id").as("entity_b"), col("p_name").as("name_b"),
        col("p_brand").as("brand_b"), col("p_size").as("size_b"), col("w1").as("w1_b"))
      val pairs = left.join(right,
          col("brand_a") === col("brand_b") && col("size_a") === col("size_b") &&
            col("w1_a") === col("w1_b") && col("entity_a") < col("entity_b"))
        .filter(round(graft.functions.GraftFunctions.jaroWinkler(
          col("name_a"), col("name_b")), 6) >= 0.88)
        .select(col("entity_a"), col("entity_b"))
      val cc = Dedup.connectedComponents(pairs, "entity_a", "entity_b")
      parts
        .join(reps.select(col("p_name"), col("p_brand"), col("p_size"), col("rep_id")),
          Seq("p_name", "p_brand", "p_size"))
        .join(cc, col("rep_id") === cc("node"), "left")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
          coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).cast("int").as("n_members"),
          max(struct(length(col("p_name")).as("l"),
            (-col("p_partkey")).as("negk"), col("p_name").as("name")))
            .getField("name").as("golden_name"),
          max(col("p_retailprice")).as("price_max"))
    },
    Some("""WITH RECURSIVE p AS (
      SELECT p_partkey, p_name, p_brand, p_size,
             split_part(p_name, ' ', 1) AS w1 FROM part),
    prs AS (
      SELECT a.p_partkey AS ea, b.p_partkey AS eb
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.w1 = b.w1
          AND a.p_partkey < b.p_partkey
      WHERE ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.88),
    edges AS (SELECT ea AS src, eb AS dst FROM prs
              UNION SELECT eb, ea FROM prs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cc AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
           FROM reach GROUP BY src),
    labeled AS (
      SELECT pt.p_partkey, pt.p_name, pt.p_retailprice,
        COALESCE(cc.cluster_id, pt.p_partkey) AS cluster_id
      FROM part pt LEFT JOIN cc ON pt.p_partkey = cc.node),
    g AS (
      SELECT cluster_id, p_name,
        ROW_NUMBER() OVER (PARTITION BY cluster_id
          ORDER BY length(p_name) DESC, p_partkey) AS rn,
        CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS n_members,
        MAX(p_retailprice) OVER (PARTITION BY cluster_id) AS price_max
      FROM labeled)
    SELECT cluster_id, n_members, p_name AS golden_name, price_max
    FROM g WHERE rn = 1"""))

  /** Skyline (Pareto frontier) via the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.Skyline]] — logical node + planner strategy +
    * SkylineExec, tier (c) of the extension ladder): parts not
    * dominated on (price, size). The corpus pass is partition-local
    * pruning with no shuffle; only frontier candidates gather. The
    * oracle is the O(n²) NOT EXISTS formulation — the plan this
    * operator exists to avoid. */
  private val x_plan_skyline = Q(
    "x_plan_skyline",
    (s, d) => graft.plans.Skyline.of(
      Tables.part(s, d).select(col("p_partkey"), col("p_name"),
        col("p_retailprice").cast("double").as("price"),
        col("p_size").cast("long").as("psize")),
      Seq("price", "psize")),
    Some("""WITH p AS (
      SELECT p_partkey, p_name, CAST(p_retailprice AS DOUBLE) AS price,
             CAST(p_size AS BIGINT) AS psize
      FROM part)
    SELECT p_partkey, p_name, price, psize FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price >= a.price AND b.psize >= a.psize
        AND (b.price > a.price OR b.psize > a.psize))"""))

  /** Filter pushdown THROUGH the skyline operator
    * ([[graft.plans.PushFilterThroughSkyline]], an injected optimizer
    * rule): a lower-bound predicate on a maximized dimension commutes
    * with the frontier (any dominator of a passing row passes too), so
    * the filter relocates below the operator and reaches the scan. The
    * oracle computes the frontier OF THE FILTERED SET — equal by the
    * commutation theorem — and SkylineSpec pins the plan shape (filter
    * under SkylineExec) plus the non-commuting cases staying above. */
  private val x_plan_skyline_pushdown = Q(
    "x_plan_skyline_pushdown",
    (s, d) => graft.plans.Skyline.of(
        Tables.part(s, d).select(col("p_partkey"), col("p_name"),
          col("p_retailprice").cast("double").as("price"),
          col("p_size").cast("long").as("psize")),
        Seq("price", "psize"))
      .filter(col("price") >= 905.0),
    Some("""WITH p AS (
      SELECT p_partkey, p_name, CAST(p_retailprice AS DOUBLE) AS price,
             CAST(p_size AS BIGINT) AS psize
      FROM part WHERE CAST(p_retailprice AS DOUBLE) >= 905.0)
    SELECT p_partkey, p_name, price, psize FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price >= a.price AND b.psize >= a.psize
        AND (b.price > a.price OR b.psize > a.psize))"""))

  /** Salted-join correctness via the driver oracle: the skew-mitigation
    * join (graft.ops.Scale.saltedJoin — hot keys split across `factor`
    * salt replicas, bounded side replicated) must be RESULT-IDENTICAL
    * to the plain equi-join, so the oracle is simply the unsalted SQL.
    * The aggregate on top makes the compare order-free and exercises
    * the aggregate-then-join shape AQE's skew splitting can't handle —
    * the one place explicit salting remains necessary at 100 TB. */
  private val x_scale_salted = Q(
    "x_scale_salted_join",
    (s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Scale.saltedJoin(Tables.orders(s, d), dim, Seq("o_custkey"),
          factor = 8, saltCols = Seq(col("o_orderkey")))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.sumMoney(col("o_totalprice")).as("revenue"))
    },
    Some(s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
      ${Exact.sumMoneySql("o_totalprice")} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1"""))

  // --------------------------------------------------- round-5 additions

  /** Triangle counting (Graph.triangleCounts) over the co-purchase
    * graph: parts appearing together in one order are linked, orders
    * restricted to heavy line items so the graph stays sparse at any
    * SF (an order's qualifying items form a clique, so triangles exist
    * by construction wherever ≥3 heavy items share an order). The
    * degree-ordered orientation caps wedge work at O(m^1.5) however
    * skewed the degrees run — the property that makes triangle counting
    * feasible on web-scale graphs. Oracle replays orientation, wedge
    * generation and closure with row-value comparisons. */
  private val x_graph_triangles = Q(
    "x_graph_triangles",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      val l1 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val l2 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = l1.join(l2, Seq("ok")).filter(col("pa") < col("pb"))
        .select(col("pa").as("a"), col("pb").as("b")).distinct()
      Graph.triangleCounts(edges)
    },
    Some("""WITH qi AS (
      SELECT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_quantity >= 45),
    edges AS (
      SELECT DISTINCT x.pk AS a, y.pk AS b
      FROM qi x JOIN qi y ON x.ok = y.ok AND x.pk < y.pk),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY 1),
    o AS (
      SELECT
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS dd
      FROM edges e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b),
    wg AS (
      SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      FROM o o1 JOIN o o2 ON o1.src = o2.src
      WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)),
    tri AS (SELECT u, v, w FROM wg JOIN o ON o.src = wg.v AND o.dst = wg.w),
    corners AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri),
    cnt AS (SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY 1)
    SELECT d.node, d.deg, CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri
    FROM deg d LEFT JOIN cnt c ON c.node = d.node"""))

  /** Local clustering coefficient over the co-purchase graph —
    * Watts–Strogatz per-node cohesion: lcc = 2·triangles/(deg·(deg−1)),
    * from the SAME skew-safe oriented triangle count as
    * `x_graph_triangles`, plus the network average (over deg ≥ 2
    * nodes) cross-joined onto every row. The per-community-density
    * signal boilerplate/cluster triage reads next to raw triangle
    * counts. Singleton-degree nodes have no defined lcc → NULL. */
  private val x_graph_lcc = Q(
    "x_graph_lcc",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      val l1 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val l2 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = l1.join(l2, Seq("ok")).filter(col("pa") < col("pb"))
        .select(col("pa").as("a"), col("pb").as("b")).distinct()
      val tri = Graph.triangleCounts(edges)
        .withColumn("lcc_micro", when(col("deg") >= 2, round(
          col("n_tri").cast("double") * lit(2e6)
            / (col("deg") * (col("deg") - 1)).cast("double")).cast("long")))
        .localCheckpoint(true) // feeds the global mean AND the output
      val avg = tri.filter(col("deg") >= 2)
        .agg(round(sum(col("lcc_micro")).cast("double")
          / count(lit(1)).cast("double")).cast("long").as("global_cc_micro"))
      tri.crossJoin(broadcast(avg))
    },
    Some("""WITH qi AS (
      SELECT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_quantity >= 45),
    edges AS (
      SELECT DISTINCT x.pk AS a, y.pk AS b
      FROM qi x JOIN qi y ON x.ok = y.ok AND x.pk < y.pk),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY 1),
    o AS (
      SELECT
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
        CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS dd
      FROM edges e
      JOIN deg da ON da.node = e.a
      JOIN deg db ON db.node = e.b),
    wg AS (
      SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
      FROM o o1 JOIN o o2 ON o1.src = o2.src
      WHERE (o1.dd, o1.dst) < (o2.dd, o2.dst)),
    tri AS (SELECT u, v, w FROM wg JOIN o ON o.src = wg.v AND o.dst = wg.w),
    corners AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri),
    cnt AS (SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY 1),
    pernode AS (
      SELECT d.node, d.deg, CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri,
        CASE WHEN d.deg >= 2 THEN CAST(ROUND(
          CAST(COALESCE(c.n_tri, 0) AS DOUBLE) * 2000000
            / CAST(d.deg * (d.deg - 1) AS DOUBLE)) AS BIGINT) END AS lcc_micro
      FROM deg d LEFT JOIN cnt c ON c.node = d.node)
    SELECT node, deg, n_tri, lcc_micro,
      (SELECT CAST(ROUND(CAST(SUM(lcc_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
       FROM pernode WHERE deg >= 2) AS global_cc_micro
    FROM pernode"""))

  /** Degree assortativity ([[Graph.degreeAssortativity]]) of the same
    * co-purchase graph — Newman's one-number mixing summary (hubs with
    * hubs vs hubs with leaves) from exact integer sufficient
    * statistics over the symmetrized endpoint-degree pairs; symmetry
    * makes Var(x) = Var(y), so the Pearson denominator collapses to
    * one division, no sqrt. */
  private val x_graph_assort = Q(
    "x_graph_assortativity",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      val l1 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val l2 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = l1.join(l2, Seq("ok")).filter(col("pa") < col("pb"))
        .select(col("pa").as("a"), col("pb").as("b")).distinct()
      Graph.degreeAssortativity(edges)
    },
    Some("""WITH qi AS (
      SELECT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_quantity >= 45),
    edges AS (
      SELECT DISTINCT x.pk AS a, y.pk AS b
      FROM qi x JOIN qi y ON x.ok = y.ok AND x.pk < y.pk),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY 1),
    pairs AS (
      SELECT da.deg AS x, db.deg AS y
      FROM edges e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
      UNION ALL
      SELECT db.deg, da.deg
      FROM edges e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b)
    SELECT CAST(COUNT(*) / 2 AS BIGINT) AS m_edges,
      CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) > 0 THEN
        ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(x) AS DOUBLE)
          / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE), 6)
      END AS assortativity
    FROM pairs"""))

  /** Link prediction over the same co-purchase graph as
    * [[x_graph_triangles]]: [[Graph.commonNeighborTopK]] scores every
    * non-adjacent pair sharing ≥2 neighbors by neighborhood Jaccard and
    * keeps each node's top-3 predictions — the "you may also like"
    * recommender primitive. Wedge-join candidate generation (Σdeg²
    * bound, no all-pairs), one anti-join to drop existing edges, scores
    * from exact integer degree/common counts. */
  private val x_graph_linkpred = Q(
    "x_graph_linkpred",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
      val l1 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
      val l2 = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
      val edges = l1.join(l2, Seq("ok")).filter(col("pa") < col("pb"))
        .select(col("pa").as("a"), col("pb").as("b")).distinct()
      Graph.commonNeighborTopK(edges, minCommon = 2, topK = 3)
    },
    Some("""WITH qi AS (
      SELECT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem WHERE l_quantity >= 45),
    edges AS (
      SELECT DISTINCT x.pk AS a, y.pk AS b
      FROM qi x JOIN qi y ON x.ok = y.ok AND x.pk < y.pk),
    adj AS (
      SELECT a AS node, b AS nbr FROM edges
      UNION ALL SELECT b, a FROM edges),
    deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
    common AS (
      SELECT p.node AS x, q.node AS y, count(*) AS common
      FROM adj p JOIN adj q ON p.nbr = q.nbr AND p.node < q.node
      GROUP BY 1, 2 HAVING count(*) >= 2),
    cand AS (
      SELECT c.* FROM common c
      ANTI JOIN edges e ON c.x = e.a AND c.y = e.b),
    scored AS (
      SELECT x, y, common,
        ROUND(CAST(common AS DOUBLE)
          / CAST(dx.deg + dy.deg - common AS DOUBLE), 6) AS jaccard
      FROM cand
      JOIN deg dx ON dx.node = cand.x
      JOIN deg dy ON dy.node = cand.y),
    sym AS (
      SELECT x AS node, y AS candidate, common, jaccard FROM scored
      UNION ALL
      SELECT y, x, common, jaccard FROM scored)
    SELECT node, candidate, common, jaccard,
      CAST(ROW_NUMBER() OVER (PARTITION BY node
        ORDER BY jaccard DESC, candidate) AS INTEGER) AS rank
    FROM sym
    QUALIFY rank <= 3"""))

  /** SemDeDup-style semantic deduplication
    * (Similarity.semanticDedup): fixed hash-rank top-128 centroid pick
    * (the x_kmeans_step discipline), nearest-centroid assignment, one
    * representative per cluster, members flagged by cosine against
    * their representative — O(n) cosine work total, the scale-safe
    * member-vs-rep form rather than within-cluster all-pairs. The
    * oracle replays the centroid pick, the 6dp-rounded argmin
    * assignment, the (d2, id) representative choice and every member
    * cosine. The 0.4 threshold is calibrated to THIS synthetic corpus
    * (member-vs-rep cosines run 0.21–0.51; 0.4 ≈ the 95th pct) —
    * real embedding corpora use ~0.95+, a knob not a semantic. */
  private val x_dedup_semantic = Q(
    "x_dedup_semantic",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("embedding").isNotNull)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(128)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.semanticDedup(emb, cents, minCosine = 0.4)
    },
    Some("""WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (
      SELECT cid, cv FROM (
        SELECT vec_id AS cid,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        FROM embeddings WHERE embedding IS NOT NULL
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 128)),
    assign AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT a.vec_id, ct.cid,
          ROUND(list_inner_product(a.v, a.v) + list_inner_product(ct.cv, ct.cv)
            - 2 * list_inner_product(a.v, ct.cv), 6) AS d2,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
            ROUND(list_inner_product(a.v, a.v) + list_inner_product(ct.cv, ct.cv)
              - 2 * list_inner_product(a.v, ct.cv), 6), ct.cid) AS rn
        FROM c a CROSS JOIN cent ct)
      WHERE rn = 1),
    rep AS (
      SELECT cid, vec_id AS rep_id FROM (
        SELECT cid, vec_id,
          ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS rn
        FROM assign)
      WHERE rn = 1),
    norms AS (
      SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM c
      WHERE sqrt(list_inner_product(v, v)) > 0)
    SELECT a.vec_id, a.cid, r.rep_id,
      ROUND(list_inner_product(m.v, rv.v) / (m.nrm * rv.nrm), 6) AS cosine,
      ROUND(list_inner_product(m.v, rv.v) / (m.nrm * rv.nrm), 6) >= 0.4 AS is_dup
    FROM assign a
    JOIN norms m ON m.vec_id = a.vec_id
    JOIN rep r ON r.cid = a.cid
    JOIN norms rv ON rv.vec_id = r.rep_id
    WHERE a.vec_id <> r.rep_id"""))

  /** Stream-stream watermarked interval join parity
    * (EventStream.clickViewJoin): clicks and views run as TWO streaming
    * sources through the state-store-backed stream-stream join (the
    * real Structured Streaming join operator, watermark-bounded state
    * on both sides), AvailableNow; the oracle is the equivalent batch
    * interval join. Inner joins emit on match, so a single-batch run is
    * complete regardless of watermark timing — what the watermark
    * bounds is STATE, which is the 100 TB property this operator
    * exists for. */
  private val streamJoinFixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private val x_stream_join_parity = Q(
    "x_stream_join_parity",
    (s, d) => {
      val (tc, tv) = streamJoinFixtureDirs.getOrElseUpdate(d, {
        val base =
          fixtureTempDir("graft_stream_join")
        val ev = Tables.events(s, d).filter(col("ts").isNotNull)
          .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
            col("user_id"), col("event_type"))
        ev.filter(col("event_type") === "click").drop("event_type")
          .coalesce(1).write.mode("overwrite").parquet(base + "/clicks")
        ev.filter(col("event_type") === "view").drop("event_type")
          .coalesce(1).write.mode("overwrite").parquet(base + "/views")
        (base + "/clicks", base + "/views")
      })
      def src(path: String) = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .parquet(path)
      val sink = "x_stream_join_parity_sink"
      // state partitions sized to the single-file fixture (see
      // EventStream.withStatePartitions — measured 3x on this query)
      EventStream.withStatePartitions(s, 4) {
        val sq = EventStream.clickViewJoin(src(tc), src(tv),
            horizon = "24 hours", delay = "48 hours")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      s.table(sink)
        .select(col("click_id"), col("user_id"), col("click_ts"),
          col("view_id"), col("view_ts"))
    },
    Some("""SELECT c.event_id AS click_id, c.user_id,
      date_trunc('second', c.ts) AS click_ts,
      v.event_id AS view_id, date_trunc('second', v.ts) AS view_ts
    FROM events c JOIN events v ON v.user_id = c.user_id
    WHERE c.event_type = 'click' AND v.event_type = 'view'
      AND c.ts IS NOT NULL AND v.ts IS NOT NULL
      AND date_trunc('second', v.ts) <= date_trunc('second', c.ts)
      AND date_trunc('second', v.ts)
            >= date_trunc('second', c.ts) - INTERVAL 24 HOUR"""))

  /** Cross-document line-level dedup (TextOps.lineDedup — the C4/
    * RefinedWeb boilerplate-removal step): lines occurring in ≥2
    * distinct documents are stripped from every document; documents
    * survive with their unique content re-stitched in order. */
  private val x_text_line_dedup = Q(
    "x_text_line_dedup",
    (s, d) => TextOps.lineDedup(
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", lineTokens = 12, minDocs = 2),
    Some(s"""WITH ${TextOps.lineDedupSql(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)", 12, 2)}
      SELECT doc_id, n_lines, n_kept, text_kept FROM __ld_out"""))

  /** Hashed-bag-of-words linear quality classifier
    * (TextOps.hashClfScore — the fastText-shaped scoring pass every
    * production quality/toxicity filter runs): integer-exact feature
    * accumulation, one float normalization, fully oracle-replayed. */
  private val x_text_hashclf = Q(
    "x_text_hashclf",
    (s, d) => Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.hashClfScore(col("text")).as("clf_score"))
      .withColumn("clf_pass", col("clf_score") > 0),
    Some(s"""SELECT doc_id,
        CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_tokens,
        ${TextOps.hashClfScoreSql("text")} AS clf_score,
        ${TextOps.hashClfScoreSql("text")} > 0 AS clf_pass
      FROM documents WHERE text IS NOT NULL"""))

  /** One BPE tokenizer-training statistics step
    * (TextOps.bpePairStats): adjacent character-pair counts over the
    * VOCABULARY (corpus-linear word count, then pair work bounded by
    * distinct words), top-50 merge candidates with a total-order
    * tiebreak. */
  private val x_text_bpe_step = Q(
    "x_text_bpe_step",
    (s, d) => TextOps.bpePairStats(
      Tables.documents(s, d).filter(col("text").isNotNull), col("text"), k = 50),
    Some(TextOps.bpePairStatsSql(
      "(SELECT text FROM documents WHERE text IS NOT NULL)", 50)))

  /** Streaming exact dedup parity (EventStream.dedupEvents,
    * dropDuplicatesWithinWatermark): the corpus is planted with a FULL
    * COPY of itself in a second file and the source is throttled to one
    * file per micro-batch, so every duplicate arrives in a LATER batch
    * than its original and can only be suppressed by the state store
    * (not by in-batch dedup) — the cross-batch path is what this
    * operator exists for, and what the oracle (each event exactly once)
    * proves ran correctly. The watermark delay exceeds the corpus time
    * span, so no key is evicted before its duplicate arrives; at 100 TB
    * the delay is the knob that bounds state instead. */
  private val streamDedupFixtureDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val x_stream_dedup_parity = Q(
    "x_stream_dedup_parity",
    (s, d) => {
      val tmp = streamDedupFixtureDirs.getOrElseUpdate(d, {
        val t = fixtureTempDir("graft_stream_dedup")
        val ev = Tables.events(s, d).filter(col("ts").isNotNull)
          .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
            col("user_id"))
        ev.coalesce(1).write.mode("overwrite").parquet(t)
        ev.coalesce(1).write.mode("append").parquet(t) // planted duplicates
        t
      })
      val src = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .option("maxFilesPerTrigger", "1") // force the cross-batch path
        .parquet(tmp)
      val sink = "x_stream_dedup_parity_sink"
      graft.streaming.EventStream.withStatePartitions(s, 4) {
        val sq = EventStream.dedupEvents(src, delay = "60 days")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      s.table(sink).select(col("event_id"), col("ts"), col("user_id"))
    },
    Some("""SELECT event_id, date_trunc('second', ts) AS ts, user_id
      FROM events WHERE ts IS NOT NULL"""))

  /** Perceptual-hash image near-dup (Multimodal.dhashPng): the corpus
    * is the real-PNG media table UNIONED with itself under shifted ids
    * (the same image re-uploaded under a new id — what pHash catches
    * even after re-encoding). Collapse-exact-FIRST discipline: images
    * are grouped by exact dhash (one representative + member count per
    * group — re-uploads collapse here, so duplicate volume never
    * reaches the pair join), then only the DISTINCT hashes go through
    * the lossless 15-bit-chunk pigeonhole join (Hamming ≤ 3). Output is
    * near-dup GROUP pairs with member counts — linear in distinct
    * content, not quadratic in duplicates. `dhash_a` is in the output
    * so the oracle's formula-replayed hash pins every bit of the real
    * decode → resample → hash pipeline, not just the pair set. */
  /** Sobel gradient energy over the REAL PNG decode
    * ([[Multimodal.sobelPng]]): the edge/texture quality signal, exact
    * in integers (L1 magnitude), so the oracle replays the 3×3
    * convolution arithmetically from the pixel generator — decode
    * fidelity AND kernel arithmetic are both hash-checked. */
  private val x_multimodal_sobel = Q(
    "x_multimodal_sobel",
    (s, d) => Multimodal.sobelPng(s,
      Multimodal.pngMediaTable(s, Tables.documents(s, d).select(col("doc_id"))))
      .toDF(),
    Some {
      def gray(dx: Int, dy: Int) =
        s"""(((id*31 + (x+($dx))*7 + (y+($dy))*13) % 256)
          + ((id*17 + (x+($dx))*11 + (y+($dy))*5) % 256)
          + ((id*23 + (x+($dx))*3 + (y+($dy))*19) % 256))"""
      val gx = s"""((${gray(1, -1)} + 2*${gray(1, 0)} + ${gray(1, 1)})
        - (${gray(-1, -1)} + 2*${gray(-1, 0)} + ${gray(-1, 1)}))"""
      val gy = s"""((${gray(-1, 1)} + 2*${gray(0, 1)} + ${gray(1, 1)})
        - (${gray(-1, -1)} + 2*${gray(0, -1)} + ${gray(1, -1)}))"""
      s"""WITH ids AS (
        SELECT doc_id AS id,
               CAST(doc_id % 24 + 8 AS BIGINT) AS w,
               CAST(doc_id % 16 + 8 AS BIGINT) AS h
        FROM documents),
      cells AS (
        SELECT id, w, h, CAST(tx.x AS BIGINT) AS x, CAST(ty.y AS BIGINT) AS y
        FROM ids
        CROSS JOIN range(1, 31) tx(x)
        CROSS JOIN range(1, 23) ty(y)
        WHERE tx.x < w - 1 AND ty.y < h - 1)
      SELECT id AS doc_id, CAST(w AS INTEGER) AS width,
        CAST(h AS INTEGER) AS height,
        COUNT(*) AS n_interior,
        CAST(SUM(ABS($gx) + ABS($gy)) AS BIGINT) AS energy
      FROM cells
      GROUP BY 1, 2, 3"""
    })

  private val x_multimodal_phash = Q(
    "x_multimodal_phash",
    (s, d) => {
      val media = Multimodal.pngMediaTable(s,
        Tables.documents(s, d).select(col("doc_id")))
      val corpus = media.unionByName(
        media.withColumn("doc_id", col("doc_id") + lit(100000000L)))
      val groups = Multimodal.dhashPng(s, corpus).toDF()
        .groupBy(col("dhash"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_members"))
      val chunked = groups.select(col("rep_id"), col("dhash"), col("n_members"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("dhash"), c * 15).bitwiseAND(lit(0x7fffL))
              .as("key"))): _*)).as("ck"))
        .select(col("rep_id"), col("dhash"), col("n_members"),
          col("ck.chunk").as("chunk"), col("ck.key").as("key"))
      chunked.as("x").join(chunked.as("y"), Seq("chunk", "key"))
        .filter(col("x.rep_id") < col("y.rep_id"))
        .select(col("x.rep_id").as("rep_a"), col("y.rep_id").as("rep_b"),
          col("x.dhash").as("dhash_a"),
          bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).as("hamming"),
          col("x.n_members").as("n_a"), col("y.n_members").as("n_b"))
        .distinct()
        .filter(col("hamming") <= 3)
    },
    Some("""WITH ids AS (
      SELECT doc_id AS id, doc_id AS cid FROM documents
      UNION ALL
      SELECT doc_id + 100000000, doc_id FROM documents),
    dims AS (SELECT id, cid, cid % 24 + 8 AS w, cid % 16 + 8 AS h FROM ids),
    grid AS (
      SELECT id, cid, w, h,
        CAST(unnest(generate_series(0, 59)) AS BIGINT) AS b
      FROM dims),
    bits AS (
      SELECT id, b,
        ( (cid*31 + ((b%10)*w//11)*7  + ((b//10)*h//6)*13) % 256
        + (cid*17 + ((b%10)*w//11)*11 + ((b//10)*h//6)*5)  % 256
        + (cid*23 + ((b%10)*w//11)*3  + ((b//10)*h//6)*19) % 256) AS g1,
        ( (cid*31 + (((b%10)+1)*w//11)*7  + ((b//10)*h//6)*13) % 256
        + (cid*17 + (((b%10)+1)*w//11)*11 + ((b//10)*h//6)*5)  % 256
        + (cid*23 + (((b%10)+1)*w//11)*3  + ((b//10)*h//6)*19) % 256) AS g2
      FROM grid),
    hashes AS (
      SELECT id, CAST(SUM(CASE WHEN g1 > g2
          THEN CAST(1 AS BIGINT) << CAST(59 - b AS INTEGER)
          ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dhash
      FROM bits GROUP BY id),
    groups AS (
      SELECT dhash, MIN(id) AS rep_id, COUNT(*) AS n_members
      FROM hashes GROUP BY dhash)
    SELECT rep_a, rep_b, dhash_a, hamming, n_a, n_b FROM (
      SELECT a.rep_id AS rep_a, b.rep_id AS rep_b, a.dhash AS dhash_a,
        CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming,
        a.n_members AS n_a, b.n_members AS n_b
      FROM groups a JOIN groups b ON a.rep_id < b.rep_id)
    WHERE hamming <= 3"""))

  /** BM25 ranked retrieval (TextOps.bm25TopK) for a fixed keyword
    * query: integer-micro scoring makes the full ranking oracle-exact;
    * the token explode is pruned to query terms BEFORE the shuffle. */
  private val x_text_bm25 = Q(
    "x_text_bm25",
    (s, d) => TextOps.bm25TopK(
      Tables.documents(s, d).filter(col("text").isNotNull),
      "doc_id", col("text"), terms = Seq("spark", "window", "scan"), k = 20),
    Some(TextOps.bm25TopKSql(
      "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL)",
      Seq("spark", "window", "scan"), 20)))

  /** Classifier evaluation for the language-ID heuristic: per-class
    * precision / recall / F1 against the labeled lang column, derived
    * from the exact integer confusion matrix (micro-quantized metrics,
    * zero-denominator classes NULL). The model-eval companion to
    * [[x_text_langid]] — a filter heuristic ships with its measured
    * error profile, not just its predictions. All aggregates
    * combinable; output bounded by |classes|². */
  private val x_text_langid_eval = Q(
    "x_text_langid_eval",
    (s, d) => {
      val pred = TextOps.withLangId(
          Tables.documents(s, d)
            .filter(col("text").isNotNull && col("lang").isNotNull),
          col("text"), "lang_pred")
        .select(col("lang"), col("lang_pred"))
      val cm = pred.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val byTrue = cm.groupBy(col("lang").as("cls"))
        .agg(sum(col("n")).as("n_true"))
      val byPred = cm.groupBy(col("lang_pred").as("cls"))
        .agg(sum(col("n")).as("n_pred"))
      val diag = cm.filter(col("lang") === col("lang_pred"))
        .select(col("lang").as("cls"), col("n").as("n_correct"))
      val base = byTrue.join(byPred, Seq("cls"), "full_outer")
        .join(diag, Seq("cls"), "left")
        .select(col("cls"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      base
        .withColumn("precision_micro", when(col("n_pred") > 0,
          round(col("n_correct") * lit(1e6) / col("n_pred")).cast("long")))
        .withColumn("recall_micro", when(col("n_true") > 0,
          round(col("n_correct") * lit(1e6) / col("n_true")).cast("long")))
        .withColumn("f1_micro",
          when(col("precision_micro") + col("recall_micro") > 0,
            round(lit(2.0) * col("precision_micro") * col("recall_micro") /
              (col("precision_micro") + col("recall_micro"))).cast("long")))
    },
    Some(s"""WITH t AS (
      SELECT lang, text,
             list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    sc AS (
      SELECT lang, text,
        len(list_intersect(toks, ['the','a','of','and','is'])) AS s_en,
        len(list_intersect(toks, ['der','die','das','und','ist'])) AS s_de,
        len(list_intersect(toks, ['el','los','y','es','una'])) AS s_es,
        len(list_intersect(toks, ['le','la','et','les','est'])) AS s_fr
      FROM t),
    pred AS (
      SELECT lang,
        CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
             WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
             WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
             WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
             WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM sc),
    cm AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2),
    bt AS (SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS n_true
           FROM cm GROUP BY 1),
    bp AS (SELECT lang_pred AS cls, CAST(SUM(n) AS BIGINT) AS n_pred
           FROM cm GROUP BY 1),
    dg AS (SELECT lang AS cls, CAST(n AS BIGINT) AS n_correct
           FROM cm WHERE lang = lang_pred),
    base AS (
      SELECT COALESCE(bt.cls, bp.cls) AS cls,
        COALESCE(n_true, 0) AS n_true,
        COALESCE(n_pred, 0) AS n_pred,
        COALESCE(n_correct, 0) AS n_correct
      FROM bt FULL OUTER JOIN bp ON bt.cls = bp.cls
      LEFT JOIN dg ON COALESCE(bt.cls, bp.cls) = dg.cls)
    SELECT cls, n_true, n_pred, n_correct,
      CASE WHEN n_pred > 0
        THEN CAST(ROUND(n_correct * 1e6 / n_pred) AS BIGINT) END
        AS precision_micro,
      CASE WHEN n_true > 0
        THEN CAST(ROUND(n_correct * 1e6 / n_true) AS BIGINT) END
        AS recall_micro,
      CASE WHEN COALESCE(CASE WHEN n_pred > 0
              THEN CAST(ROUND(n_correct * 1e6 / n_pred) AS BIGINT) END, 0)
          + COALESCE(CASE WHEN n_true > 0
              THEN CAST(ROUND(n_correct * 1e6 / n_true) AS BIGINT) END, 0) > 0
        THEN CAST(ROUND(2.0
          * (CASE WHEN n_pred > 0
               THEN CAST(ROUND(n_correct * 1e6 / n_pred) AS BIGINT) END)
          * (CASE WHEN n_true > 0
               THEN CAST(ROUND(n_correct * 1e6 / n_true) AS BIGINT) END)
          / ((CASE WHEN n_pred > 0
                THEN CAST(ROUND(n_correct * 1e6 / n_pred) AS BIGINT) END)
            + (CASE WHEN n_true > 0
                 THEN CAST(ROUND(n_correct * 1e6 / n_true) AS BIGINT) END)))
          AS BIGINT) END AS f1_micro
    FROM base"""))

  /** Ranking evaluation: nDCG@10 of the BM25 ranking against an
    * INDEPENDENT relevance label (lang = 'en') — the falsifiability
    * gauge a retrieval stack ships next to the ANN recall query. Both
    * DCG terms and the ideal-ordering terms are micro-quantized per
    * position (ln-based log2 on both engines) so the sums are
    * order-independent integers; every window runs over the ≤10-row
    * ranked frame. */
  private val x_text_ndcg = Q(
    "x_text_ndcg",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull)
      val ranked = TextOps.bm25TopK(docs, "doc_id", col("text"),
        terms = Seq("spark", "window", "scan"), k = 10)
      val labeled = ranked.join(
        docs.select(col("doc_id"), (col("lang") === "en").cast("int").as("rel")),
        "doc_id")
      val wIdeal = org.apache.spark.sql.expressions.Window
        .orderBy(col("rel").desc, col("doc_id"))
      val terms = labeled
        .withColumn("gain_micro",
          round(col("rel") * lit(1e6) * log(lit(2.0)) / log(col("rank") + 1))
            .cast("long"))
        .withColumn("irank", row_number().over(wIdeal))
        .withColumn("ideal_micro",
          round(col("rel") * lit(1e6) * log(lit(2.0)) / log(col("irank") + 1))
            .cast("long"))
      terms.agg(count(lit(1)).as("n_ranked"),
          sum(col("rel")).cast("long").as("n_rel"),
          sum(col("gain_micro")).as("dcg_micro"),
          sum(col("ideal_micro")).as("idcg_micro"))
        .withColumn("ndcg",
          when(col("idcg_micro") > 0,
            round(col("dcg_micro").cast("double") / col("idcg_micro"), 6)))
    },
    Some(s"""WITH ranked AS (
      ${TextOps.bm25TopKSql(
        "(SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)",
        Seq("spark", "window", "scan"), 10)}),
    labeled AS (
      SELECT r.doc_id, r.rank,
        CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS rel
      FROM ranked r JOIN documents d ON r.doc_id = d.doc_id),
    terms AS (
      SELECT rel,
        CAST(ROUND(rel * 1e6 * ln(2) / ln(rank + 1)) AS BIGINT) AS gain_micro,
        CAST(ROUND(rel * 1e6 * ln(2) /
          ln(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) + 1)) AS BIGINT)
          AS ideal_micro
      FROM labeled),
    agg AS (
      SELECT COUNT(*) AS n_ranked, CAST(SUM(rel) AS BIGINT) AS n_rel,
        CAST(SUM(gain_micro) AS BIGINT) AS dcg_micro, CAST(SUM(ideal_micro) AS BIGINT) AS idcg_micro
      FROM terms)
    SELECT n_ranked, n_rel, dcg_micro, idcg_micro,
      CASE WHEN idcg_micro > 0
        THEN ROUND(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6) END AS ndcg
    FROM agg"""))

  /** DAU / WAU / MAU engagement with DAU/MAU stickiness — the
    * windowed-DISTINCT rollup every product warehouse publishes, in
    * the scalable EXPLODE-CONTRIBUTION form: windowed COUNT(DISTINCT)
    * over raw events is unbounded state, so the corpus first collapses
    * to the (user, day) frame (one combinable distinct), and each
    * user-day then CONTRIBUTES to the 7 / 30 trailing windows it
    * falls in (a bounded explode of the collapsed frame, never of raw
    * events), closing with per-day distinct counts. Day spine from
    * the corpus min/max (broadcast 1-row frame) so empty days emit
    * explicit rows; windows at the spine edges are partial by design
    * (the standard trailing-window convention). Stickiness =
    * DAU·10⁶ DIV MAU, truncating both engines.
    *
    * Scale shape: one distinct collapse over the corpus; everything
    * after runs on user-days ×7/×30 — bounded by active-user-days,
    * not events. */
  private val x_events_dau_wau_mau = Q(
    "x_events_dau_wau_mau",
    (s, d) => {
      val ud = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .localCheckpoint(true) // dau + wau + mau consumers
      def contrib(win: Int, name: String) = ud
        .withColumn("off", explode(sequence(lit(0), lit(win - 1))))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
        .distinct()
        .groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as(name))
      val dau = ud.groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("dau"))
      val spine = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      spine
        .join(dau, Seq("day"), "left")
        .join(contrib(7, "wau"), Seq("day"), "left")
        .join(contrib(30, "mau"), Seq("day"), "left")
        .na.fill(0L, Seq("dau", "wau", "mau"))
        // trailing windows past the corpus max day are clipped by the
        // spine join; within the spine every window is fully counted
        .select(col("day"), col("dau"), col("wau"), col("mau"),
          expr("CASE WHEN mau > 0 THEN dau * 1000000 DIV mau" +
            " ELSE 0 END").as("stickiness_micro"))
    },
    Some("""WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    wau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM (
        SELECT DISTINCT user_id, day + CAST(o.off AS INTEGER) AS day
        FROM ud CROSS JOIN
          (SELECT UNNEST(range(7)) AS off) o)
      GROUP BY 1),
    mau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS mau FROM (
        SELECT DISTINCT user_id, day + CAST(o.off AS INTEGER) AS day
        FROM ud CROSS JOIN
          (SELECT UNNEST(range(30)) AS off) o)
      GROUP BY 1),
    spine AS (
      SELECT UNNEST(generate_series(
        (SELECT MIN(day) FROM ud), (SELECT MAX(day) FROM ud),
        INTERVAL 1 DAY))::DATE AS day)
    SELECT s.day,
      COALESCE(d.dau, 0) AS dau,
      COALESCE(w.wau, 0) AS wau,
      COALESCE(m.mau, 0) AS mau,
      CASE WHEN COALESCE(m.mau, 0) > 0
        THEN COALESCE(d.dau, 0) * 1000000 // m.mau ELSE 0 END
        AS stickiness_micro
    FROM spine s
    LEFT JOIN dau d ON s.day = d.day
    LEFT JOIN wau w ON s.day = w.day
    LEFT JOIN mau m ON s.day = m.day"""))

  /** Cluster-aware train/val/test splitting — the leakage guard an LLM
    * data pipeline needs BETWEEN dedup and splitting: hashing each
    * document's near-dup CLUSTER representative (not the document id)
    * into the 80/10/10 buckets guarantees near-duplicates can never
    * straddle train and test (the eval-contamination failure mode the
    * decontamination queries measure after the fact — this op prevents
    * it by construction). Emitted next to the NAIVE doc-id split with
    * both schemes' crossing-pair counts: cluster-aware is 0 by
    * construction, naive is measurably > 0 on the same corpus.
    *
    * Scale shape: rides the CC cluster map (pointer-jumping, the
    * dedup-cluster machinery); the split itself is one portable-hash
    * projection and the audit two pair-list joins against the bounded
    * label frame. Output is 8 summary rows. */
  private val x_split_cluster_aware = Q(
    "x_split_cluster_aware",
    (s, d) => {
      val universe = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull
          && col("n_chars").isNotNull
          && size(split(lower(col("text")), " ")) >= 3)
        .select(col("doc_id"))
      val cc = Dedup.connectedComponents(jaccardPairsDf(s, d), "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("cluster_id"))
      val labeled = universe.join(cc, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("b_ca", Sampling.hashValue(col("cluster_id")) % 10)
        .withColumn("b_nv", Sampling.hashValue(col("doc_id")) % 10)
        .localCheckpoint(true) // consumed by 2 count arms + 2 audit joins
      def splitName(b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(b < 7, "train").when(b === 8, "val")
          .when(b === 9, "test").otherwise("train")
      def arm(scheme: String, b: org.apache.spark.sql.Column) = labeled
        .groupBy(splitName(b).as("bucket"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit(scheme).as("scheme"), col("bucket"), col("n"))
      val pairs = jaccardPairsDf(s, d).select(col("doc_a"), col("doc_b"))
      def crossing(scheme: String, bc: String) = pairs
        .join(labeled.select(col("doc_id").as("doc_a"),
          col(bc).as("ba")), Seq("doc_a"))
        .join(labeled.select(col("doc_id").as("doc_b"),
          col(bc).as("bb")), Seq("doc_b"))
        .filter(splitName(col("ba")) =!= splitName(col("bb")))
        .agg(coalesce(count(lit(1)), lit(0L)).cast("long").as("n"))
        .select(lit(scheme).as("scheme"), lit("cross_pairs").as("bucket"),
          col("n"))
      arm("cluster_aware", col("b_ca"))
        .unionByName(arm("naive", col("b_nv")))
        .unionByName(crossing("cluster_aware", "b_ca"))
        .unionByName(crossing("naive", "b_nv"))
    },
    Some(s"""WITH RECURSIVE $jaccardPairsSqlCtes,
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cc AS (SELECT src AS node, least(src, min(dst)) AS cluster_id
           FROM reach GROUP BY src),
    labeled AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
        ${Sampling.hashValueSql("COALESCE(cc.cluster_id, d.doc_id)")} % 10
          AS b_ca,
        ${Sampling.hashValueSql("d.doc_id")} % 10 AS b_nv
      FROM docs d LEFT JOIN cc ON d.doc_id = cc.node),
    named AS (
      SELECT doc_id,
        CASE WHEN b_ca = 8 THEN 'val' WHEN b_ca = 9 THEN 'test'
          ELSE 'train' END AS s_ca,
        CASE WHEN b_nv = 8 THEN 'val' WHEN b_nv = 9 THEN 'test'
          ELSE 'train' END AS s_nv
      FROM labeled)
    SELECT 'cluster_aware' AS scheme, s_ca AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM named GROUP BY 2
    UNION ALL
    SELECT 'naive', s_nv, CAST(COUNT(*) AS BIGINT)
    FROM named GROUP BY 2
    UNION ALL
    SELECT 'cluster_aware', 'cross_pairs', CAST(COUNT(*) AS BIGINT)
    FROM pairs p JOIN named a ON p.doc_a = a.doc_id
      JOIN named b ON p.doc_b = b.doc_id
    WHERE a.s_ca <> b.s_ca
    UNION ALL
    SELECT 'naive', 'cross_pairs', CAST(COUNT(*) AS BIGINT)
    FROM pairs p JOIN named a ON p.doc_a = a.doc_id
      JOIN named b ON p.doc_b = b.doc_id
    WHERE a.s_nv <> b.s_nv"""))

  /** Sequential-pattern mining (the GSP/PrefixSpan support-counting
    * step): for every ordered type pair (a, b), the number of users
    * whose event sequence contains SOME a strictly before SOME b —
    * the gap-tolerant generalization of x_events_markov (adjacent
    * transitions only) and the ordered complement of x_events_cooccur
    * (co-presence, order-blind). Plus confidence (support / users-
    * with-a) and lift against independence, both in exact integer
    * micro.
    *
    * The subsequence test compresses to interval arithmetic: with
    * idx = row_number over each user's (ts, event_id) order, "a
    * before b" holds iff min_idx(a) < max_idx(b) — so the corpus
    * collapses to ONE window pass plus a combinable (user, type)
    * min/max aggregate, and the pair test is a per-user self-join of
    * that |types|-bounded frame. Scale shape: window partitioned by
    * user (fine-grained), per-user frames ≤ |types| rows, pair counts
    * combinable; output is ≤ |types|² however large the corpus. */
  private val x_events_seqmine = Q(
    "x_events_seqmine",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val idx = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("idx"))
      val ut = idx.groupBy(col("user_id"), col("event_type"))
        .agg(min(col("idx")).as("mi"), max(col("idx")).as("ma"))
      val nUsers = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val typeSupport = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_t"))
      val a = ut.select(col("user_id"), col("event_type").as("type_a"),
        col("mi"))
      val b = ut.select(col("user_id"), col("event_type").as("type_b"),
        col("ma"))
      val pairs = a.join(b, Seq("user_id"))
        .filter(col("type_a") =!= col("type_b") && col("mi") < col("ma"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).cast("long").as("support"))
      pairs
        .join(broadcast(typeSupport.select(
          col("event_type").as("type_a"), col("n_t").as("n_a"))), Seq("type_a"))
        .join(broadcast(typeSupport.select(
          col("event_type").as("type_b"), col("n_t").as("n_b"))), Seq("type_b"))
        .crossJoin(broadcast(nUsers))
        .select(col("type_a"), col("type_b"), col("support"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          expr("support * 1000000 DIV n_a").as("confidence_micro"),
          // the support·users·10⁶ product passes 9.2e18 around 10⁹
          // users — widen to DECIMAL(38,0) like the ANOVA sums; the
          // n_a·n_b denominator wraps at the same scale, widen it too
          expr("CAST(CAST(support AS DECIMAL(38,0)) * n_users * 1000000" +
            " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .as("lift_micro"))
    },
    Some("""WITH e AS (
      SELECT user_id, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS idx
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    ut AS (
      SELECT user_id, event_type,
        CAST(MIN(idx) AS BIGINT) AS mi, CAST(MAX(idx) AS BIGINT) AS ma
      FROM e GROUP BY 1, 2),
    nu AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
    ts_sup AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        CAST(COUNT(*) AS BIGINT) AS support
      FROM ut a JOIN ut b ON a.user_id = b.user_id
        AND a.event_type <> b.event_type AND a.mi < b.ma
      GROUP BY 1, 2)
    SELECT type_b, type_a, support,
      sa.n_t AS n_a, sb.n_t AS n_b,
      support * 1000000 // sa.n_t AS confidence_micro,
      CAST(CAST(support AS DECIMAL(38,0)) * n_users * 1000000
        // (CAST(sa.n_t AS DECIMAL(38,0)) * sb.n_t) AS BIGINT)
        AS lift_micro
    FROM pairs
    JOIN ts_sup sa ON sa.event_type = type_a
    JOIN ts_sup sb ON sb.event_type = type_b
    CROSS JOIN nu"""))

  /** MEASUREMENT CONTROL, not an operator: a one-row constant that
    * rides the exact same Verify/Bench path (plan → noop sink) as
    * every real query. Its bench wall IS the per-query driver floor —
    * job scheduling, plan compilation cache lookup, sink commit — the
    * constant that dominates sub-100ms ratios at local[32] and
    * amortizes to nothing on a long-lived cluster session. bench_ratio
    * subtracts it in the floor-adjusted column so per-query ratios
    * stay honest as the registry grows; BASELINE.md cites the measured
    * value. */
  private val x_noop_floor = Q(
    "x_noop_floor",
    (s, _) => s.range(1)
      .select(org.apache.spark.sql.functions.lit(1L).as("one")),
    Some("SELECT CAST(1 AS BIGINT) AS one"))

  def all: Seq[Q] = Seq(
    x_noop_floor,
    x_graph_triangles,
    x_graph_lcc,
    x_graph_assort,
    x_text_ndcg,
    x_graph_linkpred,
    x_graph_bfs,
    x_graph_betweenness,
    x_graph_ppr,
    x_multimodal_phash,
    x_text_bm25,
    x_dedup_semantic,
    x_stream_join_parity,
    x_text_line_dedup,
    x_text_hashclf,
    x_text_bpe_step,
    x_stream_dedup_parity,
    x_dedup_exact,
    x_dedup_editdist,
    x_er_jarowinkler,
    x_er_soundex,
    x_er_fellegi_sunter,
    x_scale_salted,
    x_dedup_pipeline,
    x_dedup_jaccard,
    x_dedup_jaccard_collapsed,
    x_dedup_minhash_lsh,
    x_dedup_simhash,
    x_dedup_clusters,
    x_split_cluster_aware,
    x_dedup_survivors,
    x_sim_cosine_topk,
    x_sim_lsh_topk,
    x_sim_ivf_topk,
    x_sim_nsw_topk,
    x_sim_nsw_recall,
    x_sim_hnsw_topk,
    x_sim_hnsw_recall,
    x_sim_quantized_topk,
    x_sim_pq_adc,
    x_sim_pq_subspace,
    x_sim_ivfpq,
    x_embed_pca_power,
    x_source_dsv2,
    x_source_dsv2_agg,
    x_source_dsv2_topn,
    x_agg_topk_native,
    x_er_golden,
    x_stream_static_join,
    x_plan_skyline,
    x_plan_skyline_pushdown,
    x_events_cooccur,
    x_events_markov,
    x_events_seqmine,
    x_events_dau_wau_mau,
    x_source_schema_merge,
    x_dq_k_generalize,
    x_sample_negatives,
    x_multimodal_sobel,
    x_dedup_incremental,
    x_text_langid_eval,
    x_dedup_cluster_sizes,
    x_kmeans_step,
    x_range_band_revenue,
    x_dedup_embedding,
    x_embed_quantize,
    x_embed_project,
    x_text_stats,
    x_text_langid,
    x_text_chunks,
    x_text_fingerprint,
    x_text_redact,
    x_curation_pipeline,
    x_split_sample,
    x_stratified_sample,
    x_sample_priority,
    x_sample_ares,
    x_mixture_weighted,
    x_pack_sequences,
    x_decontaminate,
    x_decontaminate_bloom,
    x_multimodal_features,
    x_multimodal_resize_frames,
    x_multimodal_audio,
    x_multimodal_video,
    x_asof_clicks_views,
    x_asof_forward_purchase,
    x_events_funnel,
    x_events_hourly,
    x_events_sessionize,
    x_events_retention,
    x_events_paths,
    x_events_json_props,
    x_events_anomaly,
    x_stream_hourly_parity,
    x_text_topterms,
    x_text_tfidf,
    x_text_unigram_logprob,
    x_text_gopher_quality,
    x_graph_pagerank,
    x_graph_sage,
    x_graph_hits,
    x_graph_pagerank_directed,
    x_shard_plan,
    x_source_jsonl,
    x_decontaminate_ngram,
    x_stream_sessionize_parity,
    x_stream_tws_counts,
    x_source_orc,
    x_sketch_suite,
  )
}
