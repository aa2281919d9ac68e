package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding float[64], label).
  *
  * Scale design:
  *  - Brute force: the query set is tiny and explicitly `broadcast()`, so
  *    the corpus scan never shuffles — each task scores its own partition
  *    and a TakeOrdered-style window keeps top-k per query. At 100 TB the
  *    corpus side stays a single pass.
  *  - LSH: 8 random-hyperplane sign bits (deterministic md5-derived
  *    hyperplanes, inlined as literals in both engines) bucket the corpus;
  *    only same-bucket candidates are scored. The bucket join is an
  *    equi-join on an 8-bit key — broadcastable queries, no cross product.
  *    More tables/probes = union of the same plan; an IVF variant swaps the
  *    signature for an argmin-over-centroids bucket id.
  *
  * Cosine math follows [[Mirror]] fold order, so scores (and therefore
  * ranks) are bit-identical to the DuckDB oracle.
  */
object Similarity {
  import Mirror._

  private val NumQueries = 16
  private val TopK = 10

  /** Brute-force cosine top-k per query vector (the exactness baseline).
    * Norms are precomputed per row, so each candidate pair costs one dot. */
  val q23AnnBruteforce = QueryDef(
    "q23_ann_bruteforce",
    s"""WITH n AS (SELECT vec_id, embedding, ${sqlNormD("embedding")} AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |    ${sqlDotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS score
       |  FROM n q, n c
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id)
       |SELECT q_id, vec_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, vec_id) AS rnk FROM scored)
       |WHERE rnk <= $TopK
       |ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        graft.functions.FloatVector.norm(col("embedding")).as("nrm"))
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val scored = emb
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (graft.functions.FloatVector.dot(col("qv"), col("embedding"))
          / (col("qn") * col("nrm"))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= TopK)
      .orderBy(col("q_id"), col("rnk"))
  }

  private val Dim = 64
  private val SigBits = 8

  /** Deterministic ±1 hyperplane components from md5 parity — identical
    * constants are inlined into the Spark plan and the oracle SQL. */
  private def planeSign(j: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$j:$d".getBytes("UTF-8"))
    if ((digest(0) & 1) == 1) 1.0 else -1.0
  }

  private def planeArr(j: Int): Column =
    array((0 until Dim).map(d => lit(planeSign(j, d))): _*)

  private def sqlPlaneArr(j: Int): String =
    (0 until Dim).map(d => planeSign(j, d).toString)
      .mkString("[", ", ", "]")

  /** 8-bit random-hyperplane signature of an embedding column. */
  private def sigCol(v: Column): Column =
    (0 until SigBits).map { j =>
      when(foldSum(zip_with(v, planeArr(j),
        (x, s) => x.cast(DoubleType) * s)) > 0.0, lit(1L << j))
        .otherwise(0L)
    }.reduce(_ + _)

  private def sqlSigCol(v: String): String =
    (0 until SigBits).map { j =>
      val dot = sqlFoldSum(
        s"list_transform(list_zip($v, ${sqlPlaneArr(j)}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))")
      s"(CASE WHEN $dot > 0.0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** LSH-bucketed ANN: score only candidates sharing the query's 8-bit
    * hyperplane signature, top-5 per query among them. */
  val q24AnnLsh = QueryDef(
    "q24_ann_lsh",
    s"""WITH sig AS (
       |  SELECT vec_id, embedding, ${sqlNormD("embedding")} AS nrm,
       |    ${sqlSigCol("embedding")} AS sig
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
       |    ${sqlDotD("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS score
       |  FROM sig q JOIN sig c ON q.sig = c.sig AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, vec_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, vec_id) AS rnk FROM scored)
       |WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    val emb = Tables(spark, dir, "embeddings")
    val sig = emb.select(col("vec_id"), col("embedding"),
      graft.functions.FloatVector.norm(col("embedding")).as("nrm"),
      sigCol(col("embedding")).as("sig"))
    val q = sig.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("sig").as("qsig"))
    val scored = sig
      .join(broadcast(q),
        col("sig") === col("qsig") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (graft.functions.FloatVector.dot(col("qv"), col("embedding"))
          / (col("qn") * col("nrm"))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Per-label centroids with deterministic float aggregation: values are
    * collected per (label, position), ordered by vec_id, and left-folded in
    * double — the order-exact way to average floats across a cluster. */
  val q25EmbeddingCentroid = QueryDef(
    "q25_embedding_centroid",
    s"""WITH e AS (
       |  SELECT label, vec_id,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
       |    unnest(embedding) AS x
       |  FROM embeddings),
       |g AS (SELECT label, pos, list(CAST(x AS DOUBLE) ORDER BY vec_id) AS xs,
       |    COUNT(*) AS n
       |  FROM e GROUP BY label, pos)
       |SELECT label, pos,
       |  ${sqlFoldSum("xs")} / CAST(n AS DOUBLE) AS centroid
       |FROM g ORDER BY label, pos""".stripMargin) { (spark, dir) =>
    centroidByPos(spark, dir).orderBy(col("label"), col("pos"))
  }

  /** Per-(label, position) centroid with the deterministic ordered fold —
    * the single source of the centroid math shared by q25's output and
    * q40's coarse quantizer (they must stay bit-identical). */
  private def centroidByPos(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
    e.groupBy(col("label"), col("pos").cast(LongType).as("pos"))
      .agg(
        sort_array(collect_list(struct(col("vec_id"), col("x")))).as("vs"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (foldSum(transform(col("vs"), v => v.getField("x").cast(DoubleType)))
          / col("n").cast(DoubleType)).as("centroid"))
  }

  /** Squared-L2 distance between a float vector and a double centroid,
    * order-exact in both engines. */
  private def sqDist(v: Column, c: Column): Column =
    foldSum(zip_with(v, c,
      (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)))

  private def sqlSqDist(v: String, c: String): String =
    sqlFoldSum(s"list_transform(list_zip($v, $c), " +
      "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
      "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))")

  private val sqlCentroidVectors =
    s"""e AS (
       |  SELECT label, vec_id,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
       |    unnest(embedding) AS x
       |  FROM embeddings),
       |g AS (SELECT label, pos, list(CAST(x AS DOUBLE) ORDER BY vec_id) AS xs,
       |    COUNT(*) AS n
       |  FROM e GROUP BY label, pos),
       |cent AS (SELECT label, pos, ${sqlFoldSum("xs")} / CAST(n AS DOUBLE)
       |    AS cx FROM g),
       |cv AS (SELECT label AS cell, list(cx ORDER BY pos) AS cvec
       |  FROM cent GROUP BY label)""".stripMargin

  /** Centroid vectors as one array per cell, from [[centroidByPos]]. */
  private def centroidVectors(spark: SparkSession, dir: String): DataFrame =
    centroidByPos(spark, dir)
      .groupBy(col("label").as("cell"))
      .agg(sort_array(collect_list(struct(col("pos"), col("centroid"))))
        .as("cs"))
      .select(col("cell"),
        transform(col("cs"), s => s.getField("centroid")).as("cvec"))

  /** IVF ANN (the centroid-bucketed scale path next to LSH q24): a coarse
    * quantizer of per-label centroids assigns every vector to its nearest
    * cell (argmin of order-exact squared L2, label tiebreak); queries probe
    * their own cell (nprobe=1) and score only co-resident candidates with
    * the native codegen dot. The K-cell centroid table is tiny and
    * broadcast; the corpus is scanned once for assignment — at 100 TB the
    * assignment is a narrow map and search cost is corpus/K per probe. */
  val q40AnnIvf = QueryDef(
    "q40_ann_ivf",
    s"""WITH $sqlCentroidVectors,
       |dists AS (
       |  SELECT m.vec_id, m.embedding, c.cell,
       |    ${sqlSqDist("m.embedding", "c.cvec")} AS d
       |  FROM embeddings m CROSS JOIN cv c),
       |assign AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d, cell) AS rn FROM dists)
       |  WHERE rn = 1),
       |n AS (SELECT vec_id, embedding, cell, ${sqlNormD("embedding")} AS nrm
       |  FROM assign),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c2.vec_id AS vec_id,
       |    ${sqlDotD("q.embedding", "c2.embedding")} / (q.nrm * c2.nrm)
       |      AS score
       |  FROM n q JOIN n c2 ON q.cell = c2.cell AND c2.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, vec_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, vec_id) AS rnk FROM scored)
       |WHERE rnk <= 5
       |ORDER BY q_id, rnk""".stripMargin) { (spark, dir) =>
    import graft.functions.FloatVector
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dists = emb.crossJoin(broadcast(centroidVectors(spark, dir)))
      .select(col("vec_id"), col("embedding"), col("cell"),
        sqDist(col("embedding"), col("cvec")).as("d"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("d"), col("cell"))
    val assigned = dists
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"),
        FloatVector.norm(col("embedding")).as("nrm"))
    val q = assigned.filter(col("vec_id") < NumQueries)
      .select(col("cell"), col("vec_id").as("q_id"),
        col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = assigned
      .join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (FloatVector.dot(col("qv"), col("embedding"))
          / (col("qn") * col("nrm"))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .orderBy(col("q_id"), col("rnk"))
  }

  val all: Seq[QueryDef] =
    Seq(q23AnnBruteforce, q24AnnLsh, q25EmbeddingCentroid, q40AnnIvf)
}
