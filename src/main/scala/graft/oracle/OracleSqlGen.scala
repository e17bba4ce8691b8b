package graft.oracle

import graft.functions.TextFunctions

/**
 * Generates the DuckDB oracle SQL for the hash/sketch-based catalogue queries
 * (SparkEntry.oracleSql). Each generated statement recomputes the ENGINE's
 * exact arithmetic in pure SQL — md5-derived hashes, unsigned-64 wraparound
 * via HUGEINT mod 2^64, IEEE double accumulation in pinned order — so the
 * driver's hash-compare is bit-exact, not approximate.
 *
 * Numeric building blocks (verified against DuckDB 1.0):
 *  - UBIGINT carries unsigned 64-bit state; xor/shift are native, multiply
 *    detours through HUGEINT and reduces mod 2^64.
 *  - `('0x' || substr(md5(s), 1, 16))::UBIGINT` equals the engine's
 *    md5Low64; 15 hex chars equal md5Low60 (fits a signed BIGINT).
 *  - `list_reduce(list_concat([init], xs), f)` is a sequential fold — the
 *    same accumulation order as the engine's while-loops over arrays.
 */
object OracleSqlGen {

  /** 2^64 — the wraparound modulus, representable only as HUGEINT. */
  private val U64 = "18446744073709551616"

  private def unsigned(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** DuckDB equivalent of TextFunctions.tokens (same regex, RE2-compatible). */
  private def toks(text: String): String =
    s"regexp_extract_all(lower($text), '[a-z0-9]+(?:''[a-z]+)?')"

  /** FNV-1a 64-bit fold over the characters of a VARCHAR expr → UBIGINT.
   * Matches TextFunctions.fingerprint / Multimodal.FakeDecoder's byte fold
   * for ASCII inputs (code point == byte). */
  private def fnv64(expr: String): String =
    s"list_reduce(list_concat([14695981039346656037::UBIGINT], " +
      s"list_transform(range(1, length($expr) + 1), " +
      s"i -> unicode(substr($expr, i, 1))::UBIGINT)), " +
      s"(acc, c) -> ((xor(acc, c)::HUGEINT * 1099511628211) % $U64)::UBIGINT)"

  /** Reinterpret a UBIGINT expr as the signed BIGINT with the same bits. */
  private def toSignedBigint(expr: String): String =
    s"(CASE WHEN $expr >= 9223372036854775808::HUGEINT " +
      s"THEN (($expr)::HUGEINT - $U64)::BIGINT ELSE ($expr)::BIGINT END)"

  /** Sequential double-precision dot product of two float-list exprs —
   * the accumulation order of TextFunctions.dot. */
  private def dotZip(a: String, b: String): String =
    s"list_reduce(list_concat([0.0::DOUBLE], " +
      s"list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE)), " +
      s"(x, y) -> x + y)"

  // --- q30: document fingerprint (FNV-1a over chars) --------------------------
  def fingerprintSql: String =
    s"SELECT doc_id, ${toSignedBigint(fnv64("text"))} AS fingerprint FROM documents"

  // --- q19: simhash over md5 token hashes -------------------------------------
  def simhashSql: String = {
    val sums = (0 until 64).map(b =>
      s"SUM(CASE WHEN ((h >> $b) % 2) = 1 THEN 1 ELSE -1 END) AS c$b").mkString(", ")
    val lowBits = (0 until 63).map(b =>
      s"(CASE WHEN c$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    val hiBit = "(CASE WHEN c63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)"
    s"""WITH tk AS (SELECT doc_id, unnest(${toks("text")}) AS t FROM documents),
       |hv AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tk),
       |bits AS (SELECT doc_id, $sums FROM hv GROUP BY doc_id)
       |SELECT d.doc_id, ($lowBits + $hiBit)::BIGINT AS simhash
       |FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id""".stripMargin
  }

  // --- q18: MinHash-LSH near-dup pairs -----------------------------------------
  def minhashPairsSql(threshold: Double, numPerm: Int = 64, bands: Int = 16,
      maxBucket: Int = 64): String =
    s"""WITH ${minhashPairsCtes(threshold, numPerm, bands, maxBucket)}
       |SELECT doc_a, doc_b, round(j, 4) AS jaccard_r FROM pr""".stripMargin

  // --- q33: connected components over the near-dup pair graph -------------------
  /** Min-reachable-id per node via a recursive CTE (UNION mode dedups, so it
   * terminates); every doc is seeded as its own singleton. */
  def minhashClustersSql(threshold: Double, numPerm: Int = 64, bands: Int = 16,
      maxBucket: Int = 64): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(threshold, numPerm, bands, maxBucket)},
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pr),
       |reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node)
       |SELECT node AS doc_id, min(label) AS cluster FROM reach GROUP BY node""".stripMargin

  /** Shared CTE chain ending in `pr(doc_a, doc_b, j)` — verified pairs. */
  private def minhashPairsCtes(threshold: Double, numPerm: Int, bands: Int,
      maxBucket: Int): String = {
    val r = numPerm / bands
    val mins = (0 until numPerm).map { p =>
      val (a, b) = TextFunctions.minhashPerm(p)
      s"min(((${unsigned(a)}::HUGEINT * x + ${unsigned(b)}::HUGEINT) % $U64)::UBIGINT) AS s$p"
    }.mkString(", ")
    val coal = (0 until numPerm).map(p =>
      s"coalesce(s$p, ${unsigned(TextFunctions.MinhashEmpty)}::UBIGINT) AS s$p").mkString(", ")
    val bandKeys = (0 until bands).map { j =>
      val init = unsigned(0x9e3779b97f4a7c15L ^ j.toLong)
      (0 until r).foldLeft(s"$init::UBIGINT") { (acc, i) =>
        s"((xor($acc, s${j * r + i})::HUGEINT * 1099511628211) % $U64)::UBIGINT"
      }
    }
    val bandIdxList = (0 until bands).mkString("[", ",", "]")
    val bandKeyList = bandKeys.mkString("[", ", ", "]")
    // shingleN = 2 word bigrams, md5Low60 per shingle, distinct set
    s"""tkn AS (SELECT doc_id, ${toks("text")} AS tk FROM documents),
       |sh AS (SELECT doc_id, list_sort(list_distinct(list_transform(
       |    CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
       |         WHEN len(tk) = 1 THEN [tk[1]]
       |         ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END,
       |    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS shs
       |  FROM tkn),
       |ex AS (SELECT doc_id, unnest(shs) AS x FROM sh),
       |sig0 AS (SELECT doc_id, $mins FROM ex GROUP BY doc_id),
       |sig AS (SELECT sh.doc_id, $coal FROM sh LEFT JOIN sig0 ON sh.doc_id = sig0.doc_id),
       |bnd AS (SELECT doc_id, unnest($bandIdxList) AS band_idx, unnest($bandKeyList) AS band_key FROM sig),
       |szd AS (SELECT doc_id, band_idx, band_key FROM (
       |    SELECT doc_id, band_idx, band_key,
       |      count(*) OVER (PARTITION BY band_idx, band_key) AS n FROM bnd)
       |  WHERE n <= $maxBucket),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM szd a JOIN szd b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |jac AS (SELECT doc_a, doc_b,
       |    CASE WHEN len(sa.shs) = 0 AND len(sb.shs) = 0 THEN 1.0::DOUBLE
       |         WHEN len(sa.shs) = 0 OR len(sb.shs) = 0 THEN 0.0::DOUBLE
       |         ELSE len(list_intersect(sa.shs, sb.shs))::DOUBLE
       |              / (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) END AS j
       |  FROM pairs JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b),
       |pr AS (SELECT doc_a, doc_b, j FROM jac WHERE j >= $threshold)""".stripMargin
  }

  // --- q20: language-ID heuristic ----------------------------------------------
  def langIdSql: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("(", ",", ")")
    def score(name: String, ws: Seq[String]) =
      s"CASE WHEN len(tk) = 0 THEN 0.0::DOUBLE " +
        s"ELSE len(list_filter(tk, x -> x IN ${inList(ws)}))::DOUBLE / len(tk) END AS $name"
    val en = Seq("the", "and", "of", "to", "is", "that", "with", "for", "was")
    val es = Seq("el", "la", "de", "que", "y", "los", "las", "una", "por")
    val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
    val fr = Seq("le", "la", "les", "des", "est", "une", "dans", "pour")
    // tie-break = larger language code (maxBy on (score, lang)): fr > es > en > de
    s"""WITH t AS (SELECT doc_id, ${toks("text")} AS tk FROM documents),
       |s AS (SELECT doc_id, len(tk) AS n,
       |  ${score("en", en)}, ${score("es", es)}, ${score("de", de)}, ${score("fr", fr)}
       |  FROM t)
       |SELECT doc_id, CASE
       |  WHEN n = 0 THEN 'und'
       |  WHEN greatest(en, es, de, fr) <= 0.0 THEN 'und'
       |  WHEN fr >= en AND fr >= es AND fr >= de THEN 'fr'
       |  WHEN es >= en AND es >= de THEN 'es'
       |  WHEN en >= de THEN 'en' ELSE 'de' END AS pred_lang
       |FROM s""".stripMargin
  }

  // --- q21: quality score --------------------------------------------------------
  def qualityScoreSql: String = {
    val stops = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "was", "at", "by", "from", "this")
    val stopList = stops.map(w => s"'$w'").mkString("(", ",", ")")
    s"""WITH t AS (SELECT doc_id, text, ${toks("text")} AS tk FROM documents),
       |sig AS (SELECT doc_id, length(text) AS n, len(tk) AS tc,
       |  CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
       |    ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) END AS alpha,
       |  CASE WHEN length(text) = 0 THEN 0.0::DOUBLE
       |    ELSE length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(text) END AS punct,
       |  CASE WHEN len(tk) = 0 THEN 0.0::DOUBLE
       |    ELSE len(list_filter(tk, x -> x IN $stopList))::DOUBLE / len(tk) END AS stop,
       |  CASE WHEN len(tk) = 0 THEN 0.0::DOUBLE
       |    ELSE list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk) END AS mtl
       |  FROM t)
       |SELECT doc_id, round(CASE WHEN n = 0 OR tc = 0 THEN 0.0::DOUBLE ELSE
       |  greatest(0.0::DOUBLE, least(1.0::DOUBLE,
       |    0.3::DOUBLE * alpha + 0.2::DOUBLE * least(1.0::DOUBLE, stop * 3.0::DOUBLE)
       |    + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE, punct * 4.0::DOUBLE))
       |    + 0.15::DOUBLE * least(1.0::DOUBLE, tc::DOUBLE / 50.0::DOUBLE)
       |    + 0.15::DOUBLE * (CASE WHEN mtl <= 0.0 THEN 0.0::DOUBLE
       |        ELSE greatest(0.0::DOUBLE, 1.0::DOUBLE - abs(mtl - 5.0::DOUBLE) / 10.0::DOUBLE) END)
       |  )) END, 6) AS quality FROM sig""".stripMargin
  }

  // --- q25/q26: multimodal blobs derived from the documents table ----------------
  /** The (doc_id, media_ref) rows SparkEntry constructs for q25/q26. */
  private def mediaRefsCte: String =
    """m AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
      |    'img://' || source || '/m' || CAST(doc_id % 7 AS VARCHAR) AS media_ref FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
      |    'aud://' || source || '/m' || CAST(doc_id % 3 AS VARCHAR) AS media_ref FROM documents)""".stripMargin

  def mediaMetaSql: String =
    s"""WITH $mediaRefsCte
       |SELECT doc_id, media_ref,
       |  CASE WHEN media_ref LIKE 'img://%' THEN 'image/fake'
       |       WHEN media_ref LIKE 'aud://%' THEN 'audio/fake'
       |       ELSE 'application/octet-stream' END AS mime,
       |  length(media_ref) AS n_bytes, md5(media_ref) AS content_md5
       |FROM m""".stripMargin

  def mediaFeaturesSql: String =
    s"""WITH $mediaRefsCte,
       |f AS (SELECT doc_id, media_ref, ${fnv64("media_ref")} AS h FROM m)
       |SELECT doc_id, media_ref, length(media_ref)::BIGINT AS n_bytes,
       |  CAST(64 + (h % 1024) AS INT) AS width,
       |  CAST(64 + ((h >> 16) % 1024) AS INT) AS height
       |FROM f""".stripMargin

  /** q31: aspect-preserving resize targets (longest side clamped). */
  def mediaResizeSql(maxDim: Int): String =
    s"""WITH $mediaRefsCte,
       |f AS (SELECT doc_id, media_ref, ${fnv64("media_ref")} AS u FROM m),
       |d AS (SELECT doc_id, media_ref,
       |    CAST(64 + (u % 1024) AS INT) AS width,
       |    CAST(64 + ((u >> 16) % 1024) AS INT) AS height FROM f)
       |SELECT doc_id, media_ref, width, height,
       |  CAST(greatest(1, floor(width * sc)) AS INT) AS out_w,
       |  CAST(greatest(1, floor(height * sc)) AS INT) AS out_h
       |FROM (SELECT *, CASE WHEN greatest(width, height) <= $maxDim THEN 1.0::DOUBLE
       |  ELSE CAST($maxDim AS DOUBLE) / greatest(width, height) END AS sc FROM d)""".stripMargin

  /** q32: frame sampling fan-out (every `everyMs`, capped, images = 1 frame). */
  def frameSampleSql(everyMs: Long, maxFrames: Int): String =
    s"""WITH $mediaRefsCte,
       |f AS (SELECT doc_id, media_ref,
       |    CASE WHEN media_ref LIKE 'aud://%'
       |         THEN CAST((${fnv64("media_ref")} >> 24) % 600000 AS BIGINT)
       |         ELSE 0 END AS dur
       |  FROM m),
       |n AS (SELECT doc_id, media_ref,
       |    least($maxFrames, dur // $everyMs + 1) AS nf FROM f)
       |SELECT doc_id, media_ref, CAST(unnest(range(nf)) AS INT) AS frame_idx,
       |  unnest(range(nf)) * $everyMs AS ts_ms
       |FROM n""".stripMargin

  // --- q24: one BSP crawl generation over the testdata-derived corpus ------------
  /** Mirrors SparkEntry's q24 corpus construction: doc m lives at
   * http://h{m%10}.example/p{m}; its links are 5 deterministic href forms
   * (absolute / needs-canonicalization / rooted / dot-segment / fragment)
   * plus a dropped mailto; seeds are docs 0..24; blacklist 'h3.example'. */
  def crawlGenSql: String =
    s"""WITH d AS (SELECT doc_id AS m,
       |    (doc_id * 7 + 3) % 500 AS t1, (doc_id * 13 + 11) % 500 AS t2,
       |    (doc_id * 3 + 1) % 500 AS t3, (doc_id * 5 + 2) % 500 AS t4,
       |    (doc_id * 11 + 7) % 500 AS t5
       |  FROM documents WHERE doc_id < 25),
       |links AS (
       |  SELECT 'http://h' || CAST(t1 % 10 AS VARCHAR) || '.example/p' || CAST(t1 AS VARCHAR) AS url FROM d
       |  UNION ALL SELECT 'http://h' || CAST(t2 % 10 AS VARCHAR) || '.example/p' || CAST(t2 AS VARCHAR) || '?a=1&b=2' FROM d
       |  UNION ALL SELECT 'http://h' || CAST(m % 10 AS VARCHAR) || '.example/p' || CAST(t3 AS VARCHAR) FROM d
       |  UNION ALL SELECT 'http://h' || CAST(m % 10 AS VARCHAR) || '.example/p' || CAST(t4 AS VARCHAR) FROM d
       |  UNION ALL SELECT 'http://h' || CAST(t5 % 10 AS VARCHAR) || '.example/p' || CAST(t5 AS VARCHAR) FROM d),
       |cand AS (SELECT DISTINCT url, string_split(url, '/')[3] AS host FROM links),
       |seeds AS (SELECT 'http://h' || CAST(doc_id % 10 AS VARCHAR) || '.example/p' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents WHERE doc_id < 25)
       |SELECT url, host FROM cand
       |WHERE host NOT LIKE '%h3.example%'
       |  AND NOT EXISTS (SELECT 1 FROM seeds s WHERE s.url = cand.url)""".stripMargin

  // --- q29: exact embedding near-dup pairs ----------------------------------------
  def embedNearDupSql(threshold: Double): String =
    s"""WITH nrm AS (SELECT vec_id, embedding,
       |    sqrt(${dotZip("embedding", "embedding")}) AS nn FROM embeddings)
       |SELECT id_a, id_b, round(cosine, 4) AS cosine_r FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotZip("a.embedding", "b.embedding")} / (a.nn * b.nn) AS cosine
       |  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
       |  WHERE a.nn != 0 AND b.nn != 0)
       |WHERE cosine >= $threshold""".stripMargin

  // --- shared: unit-norm embeddings CTE (FLOAT, engine rounding) -------------------
  private def unitCte: String =
    s"""u AS (SELECT vec_id,
       |  CASE WHEN nn = 0 THEN embedding
       |       ELSE list_transform(embedding, x -> (x::DOUBLE / nn)::FLOAT) END AS unit
       |  FROM (SELECT vec_id, embedding,
       |        sqrt(${dotZip("embedding", "embedding")}) AS nn FROM embeddings))""".stripMargin

  /** md5-derived hyperplane component for key 'hp:t:b:i' (table/bit/dim). */
  private def hpComp(t: String, b: String, i: String): String =
    s"((('0x' || substr(md5('hp:' || CAST($t AS VARCHAR) || ':' || CAST($b AS VARCHAR) " +
      s"|| ':' || CAST($i AS VARCHAR)), 1, 16))::UBIGINT >> 12)::DOUBLE " +
      s"/ 4503599627370496.0) - 1.0::DOUBLE"

  // --- q22: LSH ANN neighbour counts ------------------------------------------------
  def annLshSql(k: Int, bits: Int, tables: Int): String =
    s"""WITH $unitCte,
       |dm AS (SELECT max(len(embedding)) AS dim FROM embeddings),
       |hp AS (SELECT t, b, list_transform(range(0, dim), i -> ${hpComp("t", "b", "i")}) AS hrow
       |  FROM (SELECT unnest(range($tables)) AS t), (SELECT unnest(range($bits)) AS b), dm),
       |dots AS (SELECT vec_id, t, b,
       |    list_reduce(list_concat([0.0::DOUBLE],
       |      list_transform(list_zip(unit, hrow), p -> p[1]::DOUBLE * p[2])), (x, y) -> x + y) AS s
       |  FROM u, hp),
       |sigs AS (SELECT vec_id, t,
       |    SUM(CASE WHEN s >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
       |  FROM dots GROUP BY vec_id, t),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbour_id
       |  FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id != b.vec_id)
       |SELECT vec_id, CASE WHEN count(*) > $k THEN $k ELSE count(*) END AS n_neighbours
       |FROM cand GROUP BY vec_id""".stripMargin

  // --- q23: IVF ANN neighbour counts --------------------------------------------------
  def annIvfSql(k: Int, nLists: Int, nProbe: Int, refineSample: Int = 4096): String = {
    val zero = "list_transform(range(0, dim), z -> 0.0::DOUBLE)"
    s"""WITH $unitCte,
       |dm AS (SELECT max(len(embedding)) AS dim FROM embeddings),
       |sd AS (SELECT list_idx, seed FROM (
       |    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS list_idx,
       |      unit AS seed FROM u) WHERE list_idx < $nLists),
       |a0 AS (SELECT vec_id, unit, list_idx FROM (
       |    SELECT u.vec_id, u.unit, sd.list_idx,
       |      row_number() OVER (PARTITION BY u.vec_id
       |        ORDER BY ${dotZip("u.unit", "sd.seed")} DESC, sd.list_idx ASC) AS rn
       |    FROM u CROSS JOIN sd) WHERE rn = 1),
       |c0 AS (SELECT list_idx, list(unit ORDER BY vec_id) AS vs FROM (
       |    SELECT list_idx, vec_id, unit,
       |      row_number() OVER (PARTITION BY list_idx
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
       |    FROM a0) WHERE srn <= $refineSample GROUP BY list_idx),
       |cent AS (SELECT sd.list_idx, CASE WHEN c0.vs IS NULL THEN sd.seed
       |    ELSE list_transform(
       |      list_reduce(list_concat([$zero], c0.vs),
       |        (acc, v) -> list_transform(list_zip(acc, v), p -> p[1] + p[2]::DOUBLE)),
       |      x -> (x / len(c0.vs))::FLOAT) END AS centroid
       |  FROM sd LEFT JOIN c0 ON sd.list_idx = c0.list_idx, dm),
       |rnk AS (SELECT u.vec_id, cent.list_idx,
       |    row_number() OVER (PARTITION BY u.vec_id
       |      ORDER BY ${dotZip("u.unit", "cent.centroid")} DESC, cent.list_idx ASC) AS rn
       |  FROM u CROSS JOIN cent),
       |a1 AS (SELECT vec_id, list_idx FROM rnk WHERE rn = 1),
       |pr AS (SELECT vec_id, list_idx FROM rnk WHERE rn <= $nProbe),
       |cand AS (SELECT DISTINCT pr.vec_id AS vec_id, a1.vec_id AS neighbour_id
       |  FROM pr JOIN a1 ON pr.list_idx = a1.list_idx AND pr.vec_id != a1.vec_id)
       |SELECT vec_id, CASE WHEN count(*) > $k THEN $k ELSE count(*) END AS n_neighbours
       |FROM cand GROUP BY vec_id""".stripMargin
  }

  // --- q27: politeness cap (single-window formulation) ---------------------------------
  def politenessSql(perHostCap: Int): String =
    s"""SELECT url, host, priority FROM (
       |  SELECT url, host, priority,
       |    row_number() OVER (PARTITION BY host
       |      ORDER BY priority ASC, next_fetch ASC, url ASC) AS rn
       |  FROM (SELECT
       |    'http://h' || CAST(user_id % 50 AS VARCHAR) || '.example/e' || CAST(event_id AS VARCHAR) AS url,
       |    'h' || CAST(user_id % 50 AS VARCHAR) || '.example' AS host,
       |    CAST(event_id % 10 AS INT) AS priority, event_id AS next_fetch FROM events))
       |WHERE rn <= $perHostCap""".stripMargin

  /** Per-host politeness top-k followed by the global generation budget
   * (Politeness.capGlobalBudget): the best `budget` selected tasks across
   * ALL hosts by the same (priority, next_fetch, url) queue key. */
  def genBudgetSql(perHostCap: Int, budget: Long): String =
    s"""SELECT url, host, priority FROM (
       |  SELECT url, host, priority,
       |    row_number() OVER (ORDER BY priority ASC, next_fetch ASC, url ASC) AS grn
       |  FROM (
       |    SELECT url, host, priority, next_fetch,
       |      row_number() OVER (PARTITION BY host
       |        ORDER BY priority ASC, next_fetch ASC, url ASC) AS rn
       |    FROM (SELECT
       |      'http://h' || CAST(user_id % 50 AS VARCHAR) || '.example/e' || CAST(event_id AS VARCHAR) AS url,
       |      'h' || CAST(user_id % 50 AS VARCHAR) || '.example' AS host,
       |      CAST(event_id % 10 AS INT) AS priority, event_id AS next_fetch FROM events))
       |  WHERE rn <= $perHostCap)
       |WHERE grn <= $budget""".stripMargin

  /** Integer PageRank over the deterministic events-derived host graph
   * (HostGraph.pageRankInt) — the fixed iteration count is UNROLLED as
   * chained CTEs (recursive CTEs cannot aggregate over the recursive
   * reference). All arithmetic is 64-bit integer (// is DuckDB's integer
   * division; both engines floor on non-negative operands), so the result
   * hash-matches regardless of either engine's aggregation order. */
  def pageRankSql(iters: Int, scale: Long = 1000000L, dampPct: Int = 85,
      hostMod: Int = 80, sampleMod: Int = 11, sampleLt: Int = 2): String = {
    val base = scale * (100 - dampPct) / 100
    val head =
      s"""WITH edges AS (
         |  SELECT DISTINCT 'h' || CAST(user_id % $hostMod AS VARCHAR) AS src,
         |                  'h' || CAST(event_id % $hostMod AS VARCHAR) AS dst
         |  FROM events
         |  WHERE event_id % $sampleMod < $sampleLt
         |    AND user_id % $hostMod != event_id % $hostMod),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT n.node AS node,
         |    CAST($base + coalesce(sum(x.contrib), 0) AS BIGINT) AS rank
         |  FROM nodes n
         |  LEFT JOIN (SELECT e.dst AS dst, ((r.rank * $dampPct) // 100) // o.d AS contrib
         |             FROM edges e JOIN r${i - 1} r ON r.node = e.src
         |             JOIN outdeg o ON o.src = e.src) x
         |  ON x.dst = n.node
         |  GROUP BY n.node)""".stripMargin
    }.mkString
    s"$head$rounds\nSELECT node, rank FROM r$iters"
  }

  // --- q43: composite quality gate -----------------------------------------------
  /** Reason-coded keep/drop over the composed signal CTEs — quality score
   * (q21's SQL verbatim), language-ID (q20's), whitespace token count and
   * the top-bigram fraction (q40's bigram branch). Rule order must match
   * `QualityGate`: first failure wins. */
  def qualityGateSql(minTokens: Int, minQuality: Double,
      langs: Set[String], maxTopBigram: Double): String = {
    val langList = langs.toSeq.sorted.map(l => s"'$l'").mkString("(", ",", ")")
    s"""WITH q AS ($qualityScoreSql),
       |l AS ($langIdSql),
       |w AS (SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens FROM documents),
       |bg AS (SELECT doc_id, bigram, count(*) AS c FROM (
       |         SELECT doc_id, unnest(list_transform(
       |           range(1, len(string_split(text,' '))),
       |           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bigram
       |         FROM documents WHERE len(string_split(text,' ')) >= 2)
       |       GROUP BY doc_id, bigram),
       |bs AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac
       |       FROM bg GROUP BY doc_id),
       |s AS (SELECT w.doc_id AS doc_id, ws_tokens, quality, pred_lang,
       |        coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
       |      FROM w JOIN q USING (doc_id) JOIN l USING (doc_id)
       |      LEFT JOIN bs USING (doc_id)),
       |g AS (SELECT doc_id, CASE
       |        WHEN ws_tokens < $minTokens THEN 'too_few_tokens'
       |        WHEN pred_lang NOT IN $langList THEN 'non_target_lang'
       |        WHEN quality < $minQuality THEN 'low_quality'
       |        WHEN top_bigram_frac > $maxTopBigram THEN 'repetitive'
       |        ELSE 'ok' END AS reason
       |      FROM s)
       |SELECT doc_id, reason, reason = 'ok' AS keep FROM g""".stripMargin
  }

  // --- q44: end-to-end corpus construction ---------------------------------------
  /** The full training-corpus build chained in one statement: quality gate
   * (q43's SQL) → exact dedup (min doc_id per identical text, q11's rule) →
   * token-budget prefix (q41's window running sum) over the survivors. */
  def corpusBuildSql(minTokens: Int, minQuality: Double, langs: Set[String],
      maxTopBigram: Double, budget: Long): String =
    s"""WITH gate AS (${qualityGateSql(minTokens, minQuality, langs, maxTopBigram)}),
       |gated AS (SELECT d.doc_id, d.text FROM documents d
       |          JOIN gate ON gate.doc_id = d.doc_id AND gate.reason = 'ok'),
       |uniq AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
       |deduped AS (SELECT g2.doc_id, g2.text FROM gated g2 JOIN uniq USING (doc_id)),
       |t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |             md5(CAST(doc_id AS VARCHAR)) AS h
       |      FROM deduped),
       |c AS (SELECT doc_id, n_tokens,
       |             sum(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |      FROM t)
       |SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= $budget""".stripMargin
}
