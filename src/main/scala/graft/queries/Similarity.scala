package graft.queries

import graft.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search and near-duplicate detection (driver-mandated
  * extension surface): brute-force cosine top-k, LSH-bucketed ANN (scale
  * path), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Cross-engine determinism strategy: embeddings are quantized to
  * integers (`ROUND(x·1e8) AS BIGINT`, exact in both engines since
  * half-integers are exactly representable doubles), so dot products and
  * norms are exact integer sums — immune to summation order — and the
  * final cosine is one identical double division. MinHash uses min-of-md5
  * *strings* as the hash family (portable, no hex→int casts); SimHash
  * derives bits from md5 hex digits via `instr`.
  *
  * Scale notes: the brute-force side bounds the query set (50 vectors) so
  * the cross join is broadcast × corpus — linear in the corpus, the right
  * baseline shape. The LSH variants (`q_ann_lsh`) bucket-join instead of
  * cross-joining, which is the 100 TB path: candidates share a band
  * bucket, so the shuffle is on short signature keys, never all-pairs.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** embedding → BIGINT-quantized vector + its squared norm. */
  private def quantized(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT))").as("qv"))
      .withColumn("nq", expr("aggregate(transform(qv, x -> x * x), 0L, (a, x) -> a + x)"))

  private def dotQ(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  private def cosine(dq: Column, na: Column, nb: Column): Column =
    round(dq.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))), 4)

  /** distinct (doc_id, word) pairs of the corpus. */
  private def docWords(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(col("doc_id"), explode(expr("filter(split(text, ' '), x -> x <> '')")).as("word"))
      .distinct()

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: 50 query vectors × full corpus. The
    // query side is broadcast; per-pair cost is one codegen'd integer
    // fold over 64 elements.
    "q_cosine_topk" -> ((s, d) => {
      val q = quantized(s, d)
      val left = q.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("qv").as("qa"), col("nq").as("na"))
      val right = q.select(col("vec_id").as("b_id"), col("qv").as("qb"), col("nq").as("nb"))
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("cosine").desc, col("b_id").asc)
      right.crossJoin(broadcast(left))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          cosine(dotQ("qa", "qb"), col("na"), col("nb")).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("a_id"), col("b_id"), col("cosine"), col("rn").cast("long").as("rn"))
        .orderBy("a_id", "rn")
    }),

    // Embedding-cosine near-dup, blocked by label (block-local pairs
    // instead of all-pairs — the blocked-dedup shape that scales).
    "q_embed_neardup" -> ((s, d) => {
      val q = quantized(s, d)
      val a = q.select(col("label").as("la"), col("vec_id").as("a_id"),
        col("qv").as("qa"), col("nq").as("na"))
      val b = q.select(col("label").as("lb"), col("vec_id").as("b_id"),
        col("qv").as("qb"), col("nq").as("nb"))
      a.join(b, col("la") === col("lb") && col("a_id") < col("b_id"))
        .select(col("la").cast("long").as("label"), col("a_id"), col("b_id"),
          cosine(dotQ("qa", "qb"), col("na"), col("nb")).as("cosine"))
        .filter(col("cosine") >= 0.35)
        .orderBy("a_id", "b_id")
    }),

    // ANN via sign-random-projection LSH: 16 pseudo-random hyperplanes
    // (weights derived from xxhash64 — deterministic, Spark-side only, so
    // no SQL oracle; SimilaritySpec asserts recall vs brute force).
    // Candidates = pairs sharing any 4-bit band of the 16-bit signature;
    // exact cosine only on candidates. This is the 100 TB path: the join
    // is on (band, nibble) buckets, never all-pairs.
    "q_ann_lsh" -> ((s, d) => {
      val q = quantized(s, d).withColumn("sig",
        expr("""aggregate(sequence(0, 15), 0L, (acc, j) ->
                 acc + CASE WHEN aggregate(sequence(0, size(qv) - 1), 0L,
                   (sa, i) -> sa + qv[i] * (pmod(xxhash64(i, j), 2001) - 1000)) > 0
                 THEN shiftleft(1L, j) ELSE 0L END)"""))
      val bands = q.select(col("vec_id"), col("qv"), col("nq"),
        explode(expr("transform(sequence(0, 3), b -> named_struct(" +
          "'band', b, 'nibble', shiftright(sig, b * 4) % 16))")).as("bn"))
        .select(col("vec_id"), col("qv"), col("nq"),
          col("bn.band").as("band"), col("bn.nibble").as("nibble"))
      val left = bands.filter(col("vec_id") < 50)
        .select(col("band").as("xband"), col("nibble").as("xnibble"),
          col("vec_id").as("a_id"), col("qv").as("qa"), col("nq").as("na"))
      val cands = left.join(bands,
          col("xband") === col("band") && col("xnibble") === col("nibble") &&
            col("a_id") =!= col("vec_id"))
        .select(col("a_id"), col("vec_id").as("b_id"), col("qa"), col("na"),
          col("qv").as("qb"), col("nq").as("nb"))
        .dropDuplicates("a_id", "b_id")
      val w = Window.partitionBy(col("a_id"))
        .orderBy(col("cosine").desc, col("b_id").asc)
      cands
        .select(col("a_id"), col("b_id"),
          cosine(dotQ("qa", "qb"), col("na"), col("nb")).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("a_id", "rn")
    }),

    // MinHash + LSH banding over unigram shingles: 8 min-of-md5-string
    // hashes, 4 bands of 2, bucket summary for buckets holding >1 doc.
    "q_minhash_lsh" -> ((s, d) =>
      docWords(s, d)
        .crossJoin(broadcast(s.range(0, 8).select(col("id").cast("int").as("i"))))
        .select(col("doc_id"), col("i"),
          md5(concat(col("i").cast("string"), lit("|"), col("word")).cast("binary")).as("h"))
        .groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("mh"))
        .groupBy(col("doc_id"), expr("i DIV 2").as("band"))
        .agg(md5(concat(min(col("mh")), max(col("mh"))).cast("binary")).as("sig"))
        .groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("band", "sig")),

    // SimHash: 16-bit signature from md5 hex digits of the distinct
    // vocabulary, majority vote per bit.
    "q_simhash" -> ((s, d) =>
      docWords(s, d)
        .select(col("doc_id"), md5(col("word").cast("binary")).as("hw"))
        .crossJoin(broadcast(s.range(0, 16).select(col("id").cast("int").as("j"))))
        .select(col("doc_id"), col("j"),
          expr("(instr('0123456789abcdef', substr(hw, j DIV 4 + 1, 1)) - 1)" +
            " DIV CAST(pow(2, j % 4) AS INT) % 2 * 2 - 1").as("contrib"))
        .groupBy(col("doc_id"), col("j")).agg(sum(col("contrib")).as("s"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("s") > 0, expr("CAST(pow(2, j) AS BIGINT)")).otherwise(0L))
          .as("simhash"))
        .orderBy("doc_id")),

    // Word-bigram Jaccard similarity for doc pairs (bounded block),
    // integer basis points; pairs sharing no bigram drop out.
    "q_ngram_jaccard" -> ((s, d) => {
      val bigrams = load(s, d, "documents")
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(filter(split(text, ' '), x -> x <> '')) - 1)," +
            " k -> concat(element_at(filter(split(text, ' '), x -> x <> ''), k), ' '," +
            " element_at(filter(split(text, ' '), x -> x <> ''), k + 1))))")).as("bg"))
      val sizes = bigrams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = bigrams.select(col("doc_id").as("a_id"), col("bg"))
        .join(bigrams.select(col("doc_id").as("b_id"), col("bg")), "bg")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
        .select(col("a_id"), col("b_id"), col("inter"),
          (col("na") + col("nb") - col("inter")).as("uni"),
          expr("inter * 10000 DIV (na + nb - inter)").as("jac_bp"))
        .orderBy("a_id", "b_id")
    })
  )

  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id,
        |  LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |e AS (SELECT vec_id, GENERATE_SUBSCRIPTS(qv, 1) AS i, UNNEST(qv) AS v FROM q),
        |n AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nq FROM e GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dq
        |         FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 50 AND a.vec_id <> b.vec_id
        |         GROUP BY a.vec_id, b.vec_id),
        |cos AS (SELECT a_id, b_id,
        |  ROUND(CAST(dq AS DOUBLE) / (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE))), 4) AS cosine
        |  FROM dots JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id)
        |SELECT a_id, b_id, cosine, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id ASC) AS rn
        |  FROM cos) WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin,
    "q_embed_neardup" ->
      """WITH q AS (SELECT vec_id, label,
        |  LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |e AS (SELECT vec_id, label, GENERATE_SUBSCRIPTS(qv, 1) AS i, UNNEST(qv) AS v FROM q),
        |n AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nq FROM e GROUP BY vec_id),
        |dots AS (SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
        |           CAST(SUM(a.v * b.v) AS BIGINT) AS dq
        |         FROM e a JOIN e b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
        |         GROUP BY a.label, a.vec_id, b.vec_id)
        |SELECT CAST(label AS BIGINT) AS label, a_id, b_id, cosine FROM (
        |  SELECT label, a_id, b_id,
        |    ROUND(CAST(dq AS DOUBLE) / (SQRT(CAST(na.nq AS DOUBLE)) * SQRT(CAST(nb.nq AS DOUBLE))), 4) AS cosine
        |  FROM dots JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id)
        |WHERE cosine >= 0.35 ORDER BY a_id, b_id""".stripMargin,
    "q_minhash_lsh" ->
      s"""WITH w AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, UNNEST($duckToks) AS word FROM documents)),
         |h AS (SELECT doc_id, i, MIN(MD5(CAST(i AS VARCHAR) || '|' || word)) AS mh
         |      FROM w CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5,6,7]) AS i)
         |      GROUP BY doc_id, i),
         |b AS (SELECT doc_id, i // 2 AS band, MD5(MIN(mh) || MAX(mh)) AS sig
         |      FROM h GROUP BY doc_id, i // 2)
         |SELECT band, sig, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM b GROUP BY band, sig HAVING COUNT(*) > 1 ORDER BY band, sig""".stripMargin,
    "q_simhash" ->
      s"""WITH w AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, UNNEST($duckToks) AS word FROM documents)),
         |bits AS (SELECT doc_id, j,
         |    SUM((STRPOS('0123456789abcdef', SUBSTR(MD5(word), j // 4 + 1, 1)) - 1)
         |        // CAST(POW(2, j % 4) AS INT) % 2 * 2 - 1) AS s
         |  FROM w CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS j)
         |  GROUP BY doc_id, j)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents WHERE doc_id < 40),
         |bg AS (SELECT DISTINCT doc_id, bg FROM
         |  (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
         |     k -> toks[k] || ' ' || toks[k + 1])) AS bg FROM t)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM bg GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |          FROM bg a JOIN bg b ON a.bg = b.bg AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, inter, na + nb - inter AS uni,
         |  inter * 10000 // (na + nb - inter) AS jac_bp
         |FROM inter
         |JOIN (SELECT doc_id AS a_id, n AS na FROM sizes) USING (a_id)
         |JOIN (SELECT doc_id AS b_id, n AS nb FROM sizes) USING (b_id)
         |ORDER BY a_id, b_id""".stripMargin
  )
}
