package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Hashing

/** Embedding similarity operators over an `embeddings` table
  * `(vec_id, embedding: array<float>, label)` — approximate-nearest-
  * neighbor search and cosine near-duplicate detection for training-data
  * curation.
  *
  * Scale design:
  *  - Brute-force top-k is the correctness baseline: broadcast the (small)
  *    query set against the full corpus — one narrow pass over the big
  *    side, partial top-k per partition via window rank after a shuffle
  *    keyed by query id. Exact, O(|Q|·N) — fine for |Q| in the thousands.
  *  - The scale path is random-hyperplane LSH: each vector maps to a
  *    `nBits`-bit sign bucket (narrow map); candidates are same-bucket (or
  *    neighboring-bucket) joins — shuffle keyed by bucket, never all-pairs.
  *  - All dot products run as codegen'd higher-order functions
  *    (`zip_with` + `aggregate`) over `double`-cast elements so results are
  *    reproducible across engines (float summation order is fixed:
  *    element order).
  */
object Similarity {

  /** Deterministic element-order dot product in double precision, via the
    * native codegen'd [[DotProduct]] expression (the equivalent
    * `aggregate(zip_with(...))` higher-order form interprets its lambda
    * per element — ~10× slower on 64-dim embeddings).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine near-duplicate pairs above `threshold` among vectors that share
    * an LSH sign bucket (see [[signBucket]]) — the scalable near-dup path.
    * With `nBits = 0` this degrades to exact all-pairs (test/oracle mode).
    */
  def cosineNearDups(df: DataFrame, id: Column, vec: Column,
                     threshold: Double, nBits: Int = 0): DataFrame = {
    // norms computed ONCE per vector before the pair join — recomputing
    // them per pair would fold each vector O(candidates) times
    val base = df.select(id.as("id"), vec.as("v"))
      .withColumn("bucket", if (nBits == 0) lit(0L) else signBucket(col("v"), nBits))
      .withColumn("nrm", norm(col("v")))
    val l = base.select(col("bucket"), col("id").as("id_l"), col("v").as("v_l"), col("nrm").as("n_l"))
    val r = base.select(col("bucket"), col("id").as("id_r"), col("v").as("v_r"), col("nrm").as("n_r"))
    l.join(r, Seq("bucket")).filter(col("id_l") < col("id_r"))
      .withColumn("cos", round(dot(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")), 6))
      .filter(col("cos") >= threshold)
      // each vector lives in exactly ONE bucket, so pairs are already
      // unique — a distinct here would add a full shuffle for nothing
      .select(col("id_l"), col("id_r"), col("cos"))
  }

  /** Banded sign-LSH cosine near-dup — the 100-TB path. The single-bucket
    * form above has a width/recall trade: more bits bound the candidate
    * count (pairs grow with (corpus/2^nBits)² per bucket) but split true
    * neighbors across buckets. Banding OR-amplifies recall the way
    * MinHash/SimHash banding does: ONE `bands*rowBits`-bit signature per
    * vector (computed once), band k's bucket = bits [k·r, (k+1)·r); a pair
    * is a candidate when ANY band matches (recall 1−(1−p^r)^b vs the
    * single bucket's p^{nBits}), then exact cosine verifies. Exact
    * duplicates agree on every sign bit, so they are candidates in every
    * band — recall 1 for cos = 1 by construction.
    *
    * Scale shape: candidate generation is `bands` bucket-keyed joins in one
    * plan (explode + join on (band, bucket)); cosine + threshold run
    * BEFORE the pair-distinct so the dedup shuffle carries only surviving
    * (id, id, cos) triples, never vectors. Default `rowBits = 0`
    * SELF-SIZES to `clamp(ceil(log2(corpus)) − 5, 8, 62/bands)` from one
    * cheap `count()` (the measured failure mode of a fixed sandbox width:
    * 954 s single-bucket saturation at 500 k vectors — BENCH.md); pass an
    * explicit value to pin it (the oracled driver queries do). Raise
    * `bands` to buy recall at linear candidate cost.
    */
  def cosineNearDupsBanded(df: DataFrame, id: Column, vec: Column,
                           threshold: Double, bands: Int = 4,
                           rowBits: Int = 0): DataFrame = {
    require(bands >= 1 && rowBits >= 0 && bands * rowBits <= 62,
      s"bands*rowBits must fit a long, got $bands*$rowBits")
    val rb =
      if (rowBits > 0) rowBits
      else math.min(62 / bands, graft.dedup.Dedupe.autoBandBits(df.count()))
    val mask = (1L << rb) - 1
    val base = df.select(id.as("id"), vec.as("v"))
      .withColumn("sig", signBucket(col("v"), bands * rb))
      .withColumn("nrm", norm(col("v")))
    val bandStructs = (0 until bands).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("sig"), k * rb).bitwiseAND(lit(mask)).as("bucket"))
    }
    val banded = base
      .select(col("id"), col("v"), col("nrm"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("v"), col("nrm"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_l"),
      col("v").as("v_l"), col("nrm").as("n_l"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_r"),
      col("v").as("v_r"), col("nrm").as("n_r"))
    l.join(r, Seq("band", "bucket")).filter(col("id_l") < col("id_r"))
      .withColumn("cos", round(dot(col("v_l"), col("v_r")) / (col("n_l") * col("n_r")), 6))
      // threshold BEFORE the distinct: the dedup shuffle (needed — a pair
      // can collide in >1 band) carries only surviving skinny triples
      .filter(col("cos") >= threshold)
      .select(col("id_l"), col("id_r"), col("cos"))
      .distinct()
  }

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). `queries` should be small — it is
    * broadcast; the corpus side streams. Ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: Column, vec: Column, k: Int): DataFrame = {
    val c = corpus.select(id.as("nbr_id"), vec.as("nbr_v"), norm(vec).as("n_c"))
    val q = queries.select(id.as("query_id"), vec.as("q_v"), norm(vec).as("n_q"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("q_v"), col("nbr_v")) / (col("n_q") * col("n_c")), 6))
      // skinny BEFORE the window: the per-query top-k sorts and shuffles
      // |Q|*N rows, and dragging the vectors through that sort measured
      // as the dominant cost of the whole query (BENCH.md, PQSTAGE)
      .select(col("query_id"), col("nbr_id"), col("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** Random-hyperplane sign bucket: bit j = sign of <v, r_j> where r_j is a
    * deterministic ±1 hyperplane derived from the cross-engine hash of
    * `(j, i)` — reproducible everywhere, no stored model. Narrow map.
    *
    * The signs are PLAN-TIME constants, so each projection is a native
    * [[DotProduct]] against an array literal (the per-element
    * hash-in-a-lambda formulation cost one md5 per dimension per row).
    * Literals carry [[MaxDim]] signs; `DotProduct` stops at the shorter
    * array, so any vector length ≤ MaxDim works.
    */
  def signBucket(vec: Column, nBits: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    (0 until nBits).map { j =>
      val signs = lit((0 until MaxDim).map(i => planeSignJvm(j, i)).toArray)
      val proj = Bridge.column(DotProduct(Bridge.expression(vec), Bridge.expression(signs)))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Max supported embedding dimensionality for LSH sign buckets. */
  val MaxDim = 1024

  /** ±1 hyperplane component for (plane j, dim i): parity of the shared
    * 60-bit md5-prefix hash of "j:i" — the JVM twin of [[Hashing.h15]],
    * identically computable in the DuckDB oracle.
    */
  def planeSignJvm(j: Int, i: Int): Double = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    val hex = mdig.digest(s"$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0 else -1.0
  }

  /** IVF ANN (inverted-file index): k-means the corpus into `nlist` cells,
    * search only the `nprobe` cells nearest each query — the classic
    * Faiss-style scale path. Centroids come from Spark ML KMeans (tiny
    * model, broadcast by construction); cell assignment is a narrow map;
    * the probe join shuffles on cell id only. Recall is tuned by
    * nprobe/nlist; the exactness baseline is [[bruteForceTopK]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c = corpus.select(id.as("nbr_id"), vec.as("nbr_v"))
      .withColumn("fv", array_to_vector(col("nbr_v")))
    val model = new KMeans().setK(nlist).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(c)
    val assigned = model.transform(c).select(col("nbr_id"), col("nbr_v"), col("cell"))

    // per-query nprobe nearest cells: centroids are tiny — inline as rows
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")
    val q = queries.select(id.as("query_id"), vec.as("q_v"))
    val probes = q.join(broadcast(centroids), lit(true))
      .withColumn("dist", -dot(col("q_v"), col("centroid")) /
        (norm(col("q_v")) * norm(col("centroid"))))
      .withColumn("_pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cell"))))
      .filter(col("_pr") <= nprobe)
      .select(col("query_id"), col("q_v"), col("cell"))

    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("q_v"), col("nbr_v")) /
        (norm(col("q_v")) * norm(col("nbr_v"))), 6))
      .select(col("query_id"), col("nbr_id"), col("cos")) // skinny pre-window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** IVF ANN with deterministic hash-seeded centroids: the `nlist` corpus
    * vectors with the smallest `(h15(id), id)` seed the cells — a single
    * seeded assignment pass instead of k-means iterations. Unlike
    * [[ivfTopK]] the cells are a pure function of the data, so a SQL oracle
    * reproduces them exactly (the driver-gate variant; the ML-KMeans path
    * stays for recall tuning).
    *
    * Scale shape: seeds come from a per-partition top-k
    * (`TakeOrderedAndProject`, model-sized collect — same driver footprint
    * as a KMeans model); cell assignment is a NARROW map — centroids are
    * plan-time literal arrays, argmax runs as a sorted struct-array column
    * expression, no shuffle, no UDF; only the probe join shuffles, keyed by
    * cell id.
    */
  def ivfTopKSeeded(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
                    k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(id.as("nbr_id"), vec.as("nbr_v"))
    val cents = hashSeedCentroids(c, "nbr_id", "nbr_v", nlist)

    // cosine to centroid j — the centroid norm constant-folds at plan time
    def cellCos(v: Column, j: Int): Column =
      dot(v, lit(cents(j))) / (norm(v) * norm(lit(cents(j))))

    // top-n cells by (cos desc, cell asc): sort struct(cos, -cell) asc,
    // take the tail reversed — pure column program, narrow
    def topCells(v: Column, n: Int): Column = {
      val arr = array(cents.indices.map(j =>
        struct(cellCos(v, j).as("c"), lit(-j).as("nc"))): _*)
      slice(reverse(array_sort(arr)), 1, n)
    }

    val assigned = c.withColumn("cell",
      -element_at(topCells(col("nbr_v"), 1), 1).getField("nc"))
    val q = queries.select(id.as("query_id"), vec.as("q_v"))
      .withColumn("cell",
        explode(transform(topCells(col("q_v"), nprobe), s => -s.getField("nc"))))
    val scored = assigned.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("q_v"), col("nbr_v")) /
        (norm(col("q_v")) * norm(col("nbr_v"))), 6))
      .select(col("query_id"), col("nbr_id"), col("cos")) // skinny pre-window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("cos"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by clustering the embedding space and removing near-identical items
    * *within* each cluster — the cluster bound is what makes embedding
    * dedup tractable at corpus scale (pairs are confined to cells, never
    * corpus-wide). This variant uses the same deterministic hash-seeded
    * centroids as [[ivfTopKSeeded]] (so a SQL oracle reproduces the cells
    * exactly) and keeps the LOWEST id of each above-threshold pair — a
    * deterministic stand-in for the paper's keep-farthest-from-centroid
    * rule (any one-survivor policy satisfies the dedup contract).
    *
    * Output: one row per vector — `(vec_id, cell, max_cos, is_dup)` where
    * `max_cos` is the rounded max cosine to any LOWER-id same-cell vector
    * at/above `tau` (NULL when none) and `is_dup = max_cos IS NOT NULL`;
    * `keep = !is_dup` is the surviving corpus.
    *
    * Scale shape (10^12 rows): centroid seeding is a model-sized
    * `TakeOrderedAndProject` collect; assignment is NARROW (plan-time
    * literal centroids, sorted-struct argmax, codegen'd [[DotProduct]]);
    * the only shuffles are the cell-keyed pair join and the dup-side
    * aggregate. In-cell pair cost is Σ|cell|² — size `nlist` ∝ corpus/10⁴
    * (the paper runs 50k clusters on LAION-440M) so cells stay bounded;
    * the same auto-width rule as the LSH levers applies: `nlist <= 0`
    * SELF-SIZES from one cheap corpus count ([[autoNlist]]) — the
    * round-5 scale-safety contract (defaults must survive any corpus);
    * an explicit `nlist` stays as the override (the oracled query pins 16
    * so CORRECTNESS rows are untouched).
    */
  /** Deterministic hash-seeded centroids: the first `nl` vectors in
    * `(h15(id), id)` order — a model-sized `TakeOrderedAndProject` collect
    * (the same class as a KMeans init), SQL-reproducible so cell oracles
    * derive identical seeds. Shared by [[semDedup]], [[ivfTopKSeeded]]
    * and [[diversitySample]].
    */
  private def hashSeedCentroids(c: DataFrame, idCol: String, vCol: String,
                                nl: Int): Seq[Array[Float]] = c
    .withColumn("_hk", Hashing.h15(col(idCol).cast("string")))
    .orderBy(col("_hk"), col(idCol)).limit(nl)
    .select(col(vCol)).collect().toSeq
    .map(_.getAs[scala.collection.Seq[Float]](0).toArray)

  def semDedup(corpus: DataFrame, id: Column, vec: Column, tau: Double,
               nlist: Int = 16): DataFrame = {
    val c = corpus.select(id.as("vec_id"), vec.as("v"))
    val nl = if (nlist > 0) nlist else autoNlist(c.count())
    val cents = hashSeedCentroids(c, "vec_id", "v", nl)

    // norms once per vector, before the pair join. Assignment is ONE
    // narrow codegen'd expression looping the centroid matrix per row
    // ([[NearestCell]]) — no N×nlist fan-out, no join, any cell count
    // (an unrolled literal-argmax breaches codegen limits past ~64 cells,
    // and a broadcast-join + re-aggregate shape measured 17× wall at 10×
    // vectors because its row count grows as N·nlist ∝ N²).
    val assigned = {
      import org.apache.spark.sql.graft.Bridge
      c.withColumn("cell",
          Bridge.column(NearestCell(Bridge.expression(col("v")), cents)))
        .withColumn("nrm", norm(col("v")))
    }
    val lo = assigned.select(col("cell"), col("vec_id").as("a_id"),
      col("v").as("a_v"), col("nrm").as("a_n"))
    val hi = assigned.select(col("cell"), col("vec_id").as("b_id"),
      col("v").as("b_v"), col("nrm").as("b_n"))
    // raw (unrounded) cosine for the threshold — both engines compute the
    // identical double via the element-order fold; round only the output
    val dups = lo.join(hi, Seq("cell")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .filter(col("cos") >= tau)
      .groupBy(col("b_id").as("vec_id"))
      .agg(round(max(col("cos")), 6).as("max_cos"))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("max_cos"),
        col("max_cos").isNotNull.as("is_dup"))
  }

  /** Self-sizing cell count for [[semDedup]]: cells sized so the expected
    * in-cell population stays near `targetCell` — in-cell pair cost is
    * Σ|cell|² ≈ N²/nlist, so nlist must grow LINEARLY with the corpus to
    * hold per-cell work constant (the SemDeDup paper scales clusters the
    * same way: 50k clusters for LAION-440M ≈ 9k vectors/cell). Floor 16
    * keeps tiny corpora at the oracled query's pinned width.
    */
  def autoNlist(corpusCount: Long, targetCell: Int = 1024): Int =
    math.max(16L, (corpusCount + targetCell - 1) / targetCell)
      .min(Int.MaxValue.toLong).toInt

  /** Cluster-balanced diversity sampling: exactly `min(perCell, |cell|)`
    * vectors from every embedding cell — the "spread the eval/seed set
    * over semantic space" selection (uniform sampling over-picks the dense
    * head; per-cluster quotas cover the tail), the selection-side
    * complement of [[semDedup]]'s removal rule.
    *
    * Cells are the same deterministic hash-seeded centroids + narrow
    * [[NearestCell]] assignment as [[semDedup]] (SQL-reproducible;
    * `nlist <= 0` self-sizes via [[autoNlist]]); within a cell, the kept
    * rows are the `perCell` smallest salted id-hashes — a pure function
    * of the id ([[graft.tokens.TokenOps.stratifiedSample]]'s rule), so
    * reruns and any parallelism pick the SAME vectors.
    *
    * Scale shape (10^12 rows): assignment is narrow; `row_number ≤ n`
    * over the cell key plants a map-side WindowGroupLimit, so each task
    * forwards at most `perCell` rows per cell to the single cell-keyed
    * shuffle — a hot cell costs perCell·tasks rows in flight, never its
    * population.
    */
  def diversitySample(corpus: DataFrame, id: Column, vec: Column,
                      perCell: Int, nlist: Int = 16): DataFrame = {
    require(perCell > 0, "perCell must be positive")
    val c = corpus.select(id.as("vec_id"), vec.as("v"))
    val nl = if (nlist > 0) nlist else autoNlist(c.count())
    val cents = hashSeedCentroids(c, "vec_id", "v", nl)
    val assigned = {
      import org.apache.spark.sql.graft.Bridge
      c.withColumn("cell",
        Bridge.column(NearestCell(Bridge.expression(col("v")), cents)))
    }
    val w = Window.partitionBy(col("cell")).orderBy(
      Hashing.h15(concat(lit("divers|"), col("vec_id").cast("string"))),
      col("vec_id"))
    assigned.withColumn("cell_rank", row_number().over(w).cast("long"))
      .filter(col("cell_rank") <= perCell)
      .select(col("vec_id"), col("cell"), col("cell_rank"))
  }

  /** LSH-bucketed ANN: exact top-k *within* each query's sign bucket.
    * Probabilistic recall (multiprobe = flip 1 bit to widen); the
    * correctness baseline is [[bruteForceTopK]] — the spec measures recall
    * of this against it.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
              k: Int, nBits: Int = 8, multiprobe: Boolean = true): DataFrame = {
    val c = corpus.select(id.as("nbr_id"), vec.as("nbr_v"))
      .withColumn("bucket", signBucket(col("nbr_v"), nBits))
    val q0 = queries.select(id.as("query_id"), vec.as("q_v"))
      .withColumn("bucket", signBucket(col("q_v"), nBits))
    // multiprobe: query also probes every bucket at hamming distance 1
    val q =
      if (!multiprobe) q0
      else q0.withColumn("bucket",
        explode(array(col("bucket") +: (0 until nBits).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)))
    val scored = c.join(q, Seq("bucket")).filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(dot(col("q_v"), col("nbr_v")) /
        (norm(col("q_v")) * norm(col("nbr_v"))), 6))
      .select(col("query_id"), col("nbr_id"), col("cos")).distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic PQ codebooks: the [[hashSeedCentroids]] seed vectors cut
    * into `m` contiguous subspaces — codeword j of subspace s is dims
    * [s·dsub, (s+1)·dsub) of seed j. Single-pass, SQL-reproducible (the
    * k-means refinement of a production PQ trainer changes recall, not the
    * operator contract — same design decision as [[ivfTopKSeeded]]).
    */
  def pqCodebooks(corpus: DataFrame, id: Column, vec: Column,
                  m: Int, ksub: Int): Seq[Seq[Array[Float]]] = {
    val c = corpus.select(id.as("_id"), vec.as("_v"))
    val seeds = hashSeedCentroids(c, "_id", "_v", ksub)
    require(seeds.nonEmpty, "empty corpus")
    val dim = seeds.head.length
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    (0 until m).map(s => seeds.map(_.slice(s * dsub, (s + 1) * dsub)))
  }

  /** Product-quantization ANN (Jégou et al., PAMI 2011): encode every
    * corpus vector to `m` codeword ids (16× smaller at the default
    * geometry), DROP the vectors, and answer queries by asymmetric
    * distance computation against the codes alone — the compressed-domain
    * scan that makes exhaustive ANN affordable when the raw embedding
    * matrix no longer fits the cluster (100 TB of 1k-dim floats → ~6 TB of
    * codes). Returns per query the k nearest corpus ids by ADC L2², ties
    * by id; recall vs [[bruteForceTopK]] is the spec's measured contract.
    *
    * Scale shape (10^12 rows): codebooks are a model-sized deterministic
    * seed collect ([[pqCodebooks]]); encode is ONE narrow codegen'd
    * [[PqEncode]] per row — after it the corpus side is `(id, m ints)`,
    * so the persisted/shuffled footprint is codes, never vectors; queries
    * broadcast; scoring is a narrow codegen'd [[PqAdc]] loop (m·dsub flops
    * against plan-shipped codebooks); per-query top-k is the one shuffle,
    * and the `row_number ≤ k` plants a map-side WindowGroupLimit so each
    * task forwards at most k rows per query.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
             k: Int, m: Int = 4, ksub: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.graft.Bridge
    val cbs = pqCodebooks(corpus, id, vec, m, ksub)
    val coded = corpus.select(id.as("nbr_id"), vec.as("nbr_v"))
      .withColumn("codes",
        Bridge.column(PqEncode(Bridge.expression(col("nbr_v")), cbs)))
      .select("nbr_id", "codes") // vectors end here — ADC needs codes only
    // ADC lookup table computed ONCE per query (the broadcast side), so
    // each candidate costs m table reads, not D flops — measured: the
    // no-LUT form was SLOWER than brute force at 500k×100 (BENCH.md)
    val q = queries.select(id.as("query_id"), vec.as("q_v"))
      .withColumn("lut", Bridge.column(PqLut(Bridge.expression(col("q_v")), cbs)))
      .select("query_id", "lut")
    val scored = coded.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("ad2", Bridge.column(PqAdc(
        Bridge.expression(col("lut")), Bridge.expression(col("codes")),
        m, cbs.head.size)))
      // skinny BEFORE the window: carrying the 1KB lut + codes through
      // the top-k sort measured as 70 of 72 seconds at 500k x 100
      .select(col("query_id"), col("nbr_id"), col("ad2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("ad2"), col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("ad2"), 6).as("ad2"), col("rank"))
  }

  /** IVF-PQ ANN — the composed Faiss-style architecture for
    * billion-to-trillion-row search: the IVF stage prunes the corpus to
    * `nprobe` cells per query (cell-keyed join, never a corpus scan per
    * query) and the PQ stage evaluates only codes inside those cells
    * (m ints per row — the inverted lists hold codes, not vectors). Both
    * stages reuse the oracled building blocks: [[NearestCell]] assignment
    * over hash-seeded centroids (the [[ivfTopKSeeded]]/[[semDedup]] rule)
    * and [[PqEncode]]/[[PqAdc]] over hash-seeded codebooks (the
    * [[pqTopK]] rule). Codebooks are GLOBAL, not per-cell residual (Faiss
    * IVFPQ encodes residuals by default; that trades recall, not the
    * operator contract — documented simplification).
    *
    * Scale shape (10^12 rows): centroids + codebooks are two model-sized
    * seed collects; assignment + encode are narrow codegen'd maps after
    * which the corpus side is `(cell, id, codes)`; the probe join shuffles
    * on cell id only; ADC is narrow; per-query top-k plants a map-side
    * WindowGroupLimit.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
                k: Int, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 4, ksub: Int = 16): DataFrame = {
    require(k > 0 && nprobe >= 1 && nprobe <= nlist, "need k > 0, 1 <= nprobe <= nlist")
    import org.apache.spark.sql.graft.Bridge
    val c = corpus.select(id.as("nbr_id"), vec.as("nbr_v"))
    val cents = hashSeedCentroids(c, "nbr_id", "nbr_v", nlist)
    val cbs = pqCodebooks(corpus, id, vec, m, ksub)
    val coded = c
      .withColumn("cell",
        Bridge.column(NearestCell(Bridge.expression(col("nbr_v")), cents)))
      .withColumn("codes",
        Bridge.column(PqEncode(Bridge.expression(col("nbr_v")), cbs)))
      .select("cell", "nbr_id", "codes") // inverted lists carry codes only

    // per-query nprobe nearest cells — the ivfTopKSeeded literal-argmax
    // (query side is small and broadcast; plan-literal centroids)
    def cellCos(v: Column, j: Int): Column =
      dot(v, lit(cents(j))) / (norm(v) * norm(lit(cents(j))))
    val probeCells = {
      val arr = array(cents.indices.map(j =>
        struct(cellCos(col("q_v"), j).as("c"), lit(-j).as("nc"))): _*)
      slice(reverse(array_sort(arr)), 1, nprobe)
    }
    val q = queries.select(id.as("query_id"), vec.as("q_v"))
      .withColumn("cell", explode(transform(probeCells, s => -s.getField("nc"))))
      .withColumn("lut", Bridge.column(PqLut(Bridge.expression(col("q_v")), cbs)))
      .select("query_id", "cell", "lut")

    val scored = coded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("ad2", Bridge.column(PqAdc(
        Bridge.expression(col("lut")), Bridge.expression(col("codes")),
        m, cbs.head.size)))
      .select(col("query_id"), col("nbr_id"), col("ad2")) // skinny pre-window
    val w = Window.partitionBy(col("query_id")).orderBy(col("ad2"), col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("ad2"), 6).as("ad2"), col("rank"))
  }
}
