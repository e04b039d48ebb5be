package graft.queries

import graft.functions.TextFunctions
import graft.pipeline.Dedup

/**
 * DuckDB oracle SQL for the pipeline queries whose kernels were
 * previously rows-only. Every hash in the Spark pipeline (polynomial
 * codepoint hash mod 2^31-1, affine minhash permutations, two-lane
 * simhash spread, squared-LCG ±1 SRP planes) is pure integer/IEEE
 * arithmetic, so the oracle recomputes the IDENTICAL values in SQL —
 * the driver's hash compare then verifies the whole pipeline
 * end-to-end, not just row counts.
 *
 * Floating-point invariants relied on: both engines evaluate the
 * replicated expressions left-to-right over the same doubles, and both
 * round doubles half-away-from-zero on the shortest decimal
 * representation, so `round(x, k)` of identically-computed values
 * matches bit-for-bit.
 */
object PipelineOracles {

  private val P = "2147483647" // 2^31 - 1

  /** Polynomial codepoint hash of a string SQL expression, acc0 = 7 —
    * mirrors TokenShingleHashes.compute for one token / one shingle
    * string. unicode('') returns -1 in DuckDB (empty-string artifact of
    * string_split), hence the >= 0 filter. */
  private def poly(s: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
       |  list_filter(list_transform(string_split($s, ''), c -> CAST(unicode(c) AS BIGINT)),
       |              x -> x >= 0)),
       |  (a, c) -> (a * 31 + c) % $P)""".stripMargin

  /** Whitespace tokens, mirroring TextFunctions.tokens — the explicit
    * class (TextFunctions.WsSql) avoids the Java-vs-RE2 `\s` mismatch
    * on U+000B. */
  private def toks(textExpr: String): String =
    s"string_split_regex(trim($textExpr), '[${TextFunctions.WsSql}]+')"

  /** Word-3-gram strings with the shorter-than-n whole-text fallback,
    * mirroring TextFunctions.wordShingles(n=3). */
  private val grams3 =
    """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |     ELSE list_transform(range(1, len(toks) - 1),
      |                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END""".stripMargin

  /** The planted near-dup corpus: documents ∪ perturbed copies (last
    * ~10% of tokens dropped, id + 1e6) — mirrors
    * PipelineQueries.plantedCorpus. */
  private val corpusCte =
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |         array_to_string(list_slice(toks, 1, greatest((len(toks) * 9) // 10, 1)), ' ')
       |  FROM (SELECT doc_id, ${toks("text")} AS toks FROM documents) t
       |)""".stripMargin

  /** Minhash permutation constants as a SQL list literal [[a,b],...] —
    * the same constants Dedup.perms(64) feeds MinHashSignature. */
  private val permsLit: String =
    Dedup.perms(64).map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")

  /** 64-component minhash signature over a 31-bit hash-set column `hs`. */
  private def sigExpr: String =
    s"""list_transform($permsLit, p ->
       |  list_min(list_transform(hs, h -> (p[1] * h + p[2]) % $P)))""".stripMargin

  /** Banded bucket keys (16 bands × 4 rows) tagged with the band index,
    * mirroring Dedup.bandKeys + the (band, key) grouping. */
  private val bandsExpr =
    s"""list_transform(range(0, 16), j ->
       |  j * 2147483648 + list_reduce(
       |    list_prepend(CAST(977 AS BIGINT), list_slice(sig, j*4 + 1, j*4 + 4)),
       |    (a, x) -> (a * 31 + x) % $P))""".stripMargin

  /** Shared candidate-pair SQL: explode tagged bucket keys, cap bucket
    * size, emit distinct ordered id pairs — mirrors the
    * candidate stage inside Dedup.bucketVerifiedPairs*. Expects a CTE `bd(doc_id, bk)`. */
  private def candCte(maxBucket: Int): String =
    s"""bc AS (SELECT bk, count(*) AS n FROM bd GROUP BY bk),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bd x JOIN bd y ON x.bk = y.bk AND x.doc_id < y.doc_id
       |  JOIN bc c ON c.bk = x.bk
       |  WHERE c.n BETWEEN 2 AND $maxBucket)""".stripMargin

  // ------------------------------------------------------------- dedup

  val dedupMinhash: String =
    s"""WITH $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |gh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tok),
       |sg AS (SELECT doc_id, $sigExpr AS sig FROM gh),
       |bd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sg),
       |${candCte(1000)}
       |SELECT c.a, c.b,
       |  round(CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64, 4)
       |    AS est_jaccard
       |FROM cand c JOIN sg sa ON sa.doc_id = c.a JOIN sg sb ON sb.doc_id = c.b
       |WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 32""".stripMargin

  /** Incremental dedup: cross-set minhash candidates between the base
    * documents (corpus) and their perturbed copies (the delta batch),
    * verified on signature agreement — mirrors
    * Dedup.minhashPairsIncremental (corpus-side bucket cap, cross-set
    * collisions only). */
  val dedupIncremental: String =
    s"""WITH delta AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |         array_to_string(list_slice(toks, 1, greatest((len(toks) * 9) // 10, 1)), ' ') AS text
       |  FROM (SELECT doc_id, ${toks("text")} AS toks FROM documents) t),
       |tokc AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |tokd AS (SELECT doc_id, ${toks("text")} AS toks FROM delta),
       |ghc AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tokc),
       |ghd AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tokd),
       |sgc AS (SELECT doc_id, $sigExpr AS sig FROM ghc),
       |sgd AS (SELECT doc_id, $sigExpr AS sig FROM ghd),
       |bdc AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sgc),
       |bdd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sgd),
       |bc AS (SELECT bk, count(*) AS n FROM bdc GROUP BY bk),
       |cand AS (
       |  SELECT DISTINCT c.doc_id AS a, d.doc_id AS b
       |  FROM bdc c JOIN bdd d ON c.bk = d.bk
       |  JOIN bc ON bc.bk = c.bk
       |  WHERE bc.n <= 1000)
       |SELECT c.a, c.b,
       |  round(CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64, 4)
       |    AS est_jaccard
       |FROM cand c JOIN sgc sa ON sa.doc_id = c.a JOIN sgd sb ON sb.doc_id = c.b
       |WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 32""".stripMargin

  /** Connected components over the minhash pair graph (transitive
    * closure by recursive CTE — dup clusters are tiny, so the closure
    * is cheap at oracle scale), keeper = min reachable id. */
  val dedupClusters: String =
    s"""WITH RECURSIVE $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |gh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tok),
       |sg AS (SELECT doc_id, $sigExpr AS sig FROM gh),
       |bd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sg),
       |${candCte(1000)},
       |pairs AS (
       |  SELECT c.a, c.b
       |  FROM cand c JOIN sg sa ON sa.doc_id = c.a JOIN sg sb ON sb.doc_id = c.b
       |  WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 32),
       |edges AS (SELECT a AS src, b AS dst FROM pairs
       |          UNION SELECT b AS src, a AS dst FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r)
       |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS keep_id FROM reach GROUP BY id""".stripMargin

  import graft.functions.TextFunctions.{EmailRe, PhoneRe, UrlRe}

  /** PII injection + redaction, replaying TextFunctions.redactPii /
    * piiCount with the identical pattern strings (lookaround-free, so
    * Java regex and RE2 agree). */
  val textRedact: String =
    s"""WITH t AS (SELECT doc_id,
       |  text || ' Contact user' || doc_id || '@example.com or https://ex.org/u/' || doc_id
       |       || ' or call +1 (555) 010-' || doc_id || '.' AS t
       |  FROM documents),
       |e AS (SELECT doc_id, t, regexp_replace(t, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM t),
       |u AS (SELECT doc_id, t, t1, regexp_replace(t1, '$UrlRe', '<URL>', 'g') AS t2 FROM e)
       |SELECT doc_id,
       |  regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g') AS redacted,
       |  CAST(len(regexp_split_to_array(t, '$EmailRe')) - 1
       |     + len(regexp_split_to_array(t1, '$UrlRe')) - 1
       |     + len(regexp_split_to_array(t2, '$PhoneRe')) - 1 AS BIGINT) AS n_pii
       |FROM u""".stripMargin

  /** The cummax interval-merge tail shared by every span oracle:
    * duplicated starts in `src`(doc_id, pos) → maximal merged spans of
    * 8-token windows — ONE copy, mirroring the single Spark-side
    * Dedup.mergeSpans the three lanes share. */
  private def spanMergeSql(src: String): String =
    s"""m AS (SELECT doc_id, pos AS s, pos + 8 AS e,
       |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |      FROM $src),
       |mg AS (SELECT doc_id, s, e, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ng FROM m),
       |gr AS (SELECT doc_id, s, e, sum(ng) OVER (PARTITION BY doc_id ORDER BY s) AS grp FROM mg)
       |SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
       |       max(e) - min(s) AS n_dup_tokens
       |FROM gr GROUP BY doc_id, grp""".stripMargin

  /** Maximal cross-doc duplicated 8-token spans over the planted
    * corpus, mirroring Dedup.duplicatedSpans(k = 8): a window start is
    * duplicated when its 8-gram occurs in ≥ 2 distinct docs (the Spark
    * side groups on xxhash64 of the gram — an internal equality key
    * only, so both engines mark the same starts absent a 2⁻⁶⁴
    * collision); overlapping starts merge by the running-cummax sweep. */
  val dedupSpans: String =
    s"""WITH $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |ge0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 7),
       |          i -> struct_pack(pos := CAST(i AS BIGINT),
       |                           gram := array_to_string(list_slice(toks, i + 1, i + 8), ' ')))) AS u
       |        FROM tok WHERE len(toks) >= 8),
       |ge AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM ge0),
       |dup AS (SELECT gram FROM ge GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
       |ds AS (SELECT doc_id, pos FROM ge JOIN dup USING (gram)),
       |${spanMergeSql("ds")}""".stripMargin

  /** Delta-vs-corpus spans, mirroring Dedup.duplicatedSpansAgainst:
    * corpus grams reduce to a distinct set, any delta window hitting
    * it is duplicated, same cummax merge. */
  val dedupSpansIncremental: String =
    s"""WITH tokc AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |delta AS (SELECT doc_id + 1000000 AS doc_id,
       |         array_to_string(list_slice(toks, 1, greatest((len(toks) * 9) // 10, 1)), ' ') AS text
       |  FROM tokc),
       |tokd AS (SELECT doc_id, ${toks("text")} AS toks FROM delta),
       |cg0 AS (SELECT unnest(list_transform(range(0, len(toks) - 7),
       |          i -> array_to_string(list_slice(toks, i + 1, i + 8), ' '))) AS gram
       |        FROM tokc WHERE len(toks) >= 8),
       |cg AS (SELECT DISTINCT gram FROM cg0),
       |dg0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 7),
       |          i -> struct_pack(pos := CAST(i AS BIGINT),
       |                           gram := array_to_string(list_slice(toks, i + 1, i + 8), ' ')))) AS u
       |        FROM tokd WHERE len(toks) >= 8),
       |dg AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM dg0),
       |ds AS (SELECT doc_id, pos FROM dg JOIN cg USING (gram)),
       |${spanMergeSql("ds")}""".stripMargin

  /** Bloom-gated delta-vs-corpus spans, mirroring
    * Dedup.duplicatedSpansAgainstBloom(k=8, mBits=2^23, depth=3):
    * corpus gram POLY hashes set 3 affine positions each; a delta
    * window survives iff all 3 of its positions are set (the
    * join-per-lane formulation of bit membership, as in
    * [[sketchBloomPrune]]); same cummax merge. False positives are
    * deterministic arithmetic, so both engines emit identical spans. */
  val dedupSpansBloom: String =
    s"""WITH consts AS (${sketchConsts(3)}),
       |tokc AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |delta AS (SELECT doc_id + 1000000 AS doc_id,
       |         array_to_string(list_slice(toks, 1, greatest((len(toks) * 9) // 10, 1)), ' ') AS text
       |  FROM tokc),
       |tokd AS (SELECT doc_id, ${toks("text")} AS toks FROM delta),
       |cg0 AS (SELECT unnest(list_transform(range(0, len(toks) - 7),
       |          i -> array_to_string(list_slice(toks, i + 1, i + 8), ' '))) AS gram
       |        FROM tokc WHERE len(toks) >= 8),
       |cgh AS (SELECT DISTINCT ${poly("gram")} AS h FROM cg0),
       |bits AS (SELECT DISTINCT j, ((a * h + b) % $P) % 8388608 AS pos
       |         FROM cgh CROSS JOIN consts),
       |dg0 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 7),
       |          i -> struct_pack(pos := CAST(i AS BIGINT),
       |                           gram := array_to_string(list_slice(toks, i + 1, i + 8), ' ')))) AS u
       |        FROM tokd WHERE len(toks) >= 8),
       |dgh AS (SELECT doc_id, u.pos AS pos, ${poly("u.gram")} AS h FROM dg0),
       |kept AS (SELECT dgh.doc_id, dgh.pos
       |         FROM dgh CROSS JOIN consts r
       |         JOIN bits ON bits.j = r.j
       |                  AND bits.pos = ((r.a * dgh.h + r.b) % $P) % 8388608
       |         GROUP BY 1, 2 HAVING count(*) = 3),
       |${spanMergeSql("kept")}""".stripMargin

  val dedupNgram: String =
    s"""WITH $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |gh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tok),
       |sg AS (SELECT doc_id, $sigExpr AS sig FROM gh),
       |bd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sg),
       |${candCte(1000)}
       |SELECT c.a, c.b,
       |  CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
       |    / len(list_distinct(ha.hs || hb.hs)) AS jaccard
       |FROM cand c JOIN gh ha ON ha.doc_id = c.a JOIN gh hb ON hb.doc_id = c.b
       |WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
       |      / len(list_distinct(ha.hs || hb.hs)) >= CAST(0.6 AS DOUBLE)""".stripMargin

  /** Two-lane 62-bit spread of a 31-bit token hash (Dedup.simhashColumn
    * constants), then SimHash64 semantics: bit b set iff strictly more
    * than half of the token hashes have bit b set. */
  val dedupSimhash: String =
    s"""WITH $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |tp AS (SELECT doc_id, list_transform(toks, t -> ${poly("t")}) AS tp FROM tok),
       |th AS (SELECT doc_id, list_transform(tp, p ->
       |  ((p * ${Dedup.SimLaneA1} + ${Dedup.SimLaneB1}) % $P)
       |    * ((p * ${Dedup.SimLaneA1} + ${Dedup.SimLaneB1}) % $P) % $P * 2147483648
       |  + ((p * ${Dedup.SimLaneA2} + ${Dedup.SimLaneB2}) % $P)
       |    * ((p * ${Dedup.SimLaneA2} + ${Dedup.SimLaneB2}) % $P) % $P) AS th FROM tp),
       |sh AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(0, 62), b ->
       |    CASE WHEN 2 * len(list_filter(th, h -> ((h >> b) & 1) = 1)) > len(th)
       |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
       |  (a, x) -> a | x) AS sh FROM th),
       |bd AS (SELECT doc_id, unnest(list_transform(range(0, 4), j ->
       |  ((sh >> (j * 16)) & 65535) | (j << 32))) AS bk FROM sh),
       |${candCte(10000)}
       |SELECT c.a, c.b, CAST(bit_count(xor(sa.sh, sb.sh)) AS INTEGER) AS hamming
       |FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
       |WHERE bit_count(xor(sa.sh, sb.sh)) <= 3""".stripMargin

  // ------------------------------------------------------------- text

  /** Two-lane rolling fingerprint over a token-hash list column `th` —
    * the ONE copy of the fingerprint arithmetic, shared by
    * [[textFingerprint]] and [[curationContamination]]. */
  private val fpExpr: String =
    s"""list_reduce(list_prepend(CAST(17 AS BIGINT), th), (a, h) -> (a * 1000003 + h) % $P)
       |  * 2147483648
       |+ list_reduce(list_prepend(CAST(31 AS BIGINT), th), (a, h) -> (a * 999983 + h) % $P)""".stripMargin

  val textFingerprint: String =
    s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |th AS (SELECT doc_id, list_transform(toks, t -> ${poly("t")}) AS th FROM tok)
       |SELECT doc_id,
       |  $fpExpr AS fp,
       |  TRUE AS ws_invariant
       |FROM th""".stripMargin

  /** Overlapping 32-token windows, stride 24 — replays
    * TextFunctions.tokenChunks(32, 8): nChunks = ceil(max(n-32,0)/24)+1,
    * chunk i = tokens[i·24+1 .. i·24+32] (list_slice is inclusive,
    * matching Spark's slice(start, length=32)). */
  val textChunks: String =
    s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |c AS (SELECT doc_id, toks,
       |  CAST(ceil(CAST(greatest(len(toks) - 32, 0) AS DOUBLE) / 24) AS INT) + 1 AS nc
       |  FROM tok),
       |x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS r FROM c),
       |ch AS (SELECT doc_id, CAST(r AS BIGINT) AS chunk_idx,
       |  array_to_string(list_slice(toks, r*24 + 1, r*24 + 32), ' ') AS chunk FROM x)
       |SELECT doc_id, chunk_idx, chunk,
       |  CAST(len(${toks("chunk")}) AS BIGINT) AS n_tokens
       |FROM ch""".stripMargin

  /** The split CASE expression, generated from the SAME cumulative
    * thresholds assignSplits compares against (Curation.cumThresholds —
    * e.g. 0.8 + 0.1 is 0.9000000000000001, not 0.9).
    * Double.toString emits the shortest decimal that round-trips, so
    * DuckDB parses back the bit-identical double and no representable
    * u can fall between the two engines' branch points. */
  private def splitCase(splits: Seq[(String, Double)]): String = {
    val cum = graft.pipeline.Curation.cumThresholds(splits)
    val whens = splits.zip(cum).dropRight(1)
      .map { case ((name, _), c) =>
        s"WHEN u < ${java.lang.Double.toString(c)} THEN '$name'" }
      .mkString(" ")
    s"CASE $whens ELSE '${splits.last._1}' END"
  }

  private val split801010 =
    splitCase(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  /** Unit-interval point of Curation.assignSplits: ((id mod P)·a + b)
    * mod P, divided by P — identical IEEE doubles in both engines. */
  val curationSplits: String =
    s"""WITH u AS (SELECT doc_id,
       |  CAST(((doc_id % $P) * 1103515245 + 12345) % $P AS DOUBLE) / $P AS u
       |  FROM documents)
       |SELECT doc_id,
       |  $split801010 AS split
       |FROM u""".stripMargin

  /**
   * Sequence-packing replication: the same shard hash, the same
   * id-order scan, the same greedy fold — one recursive-CTE step per
   * in-shard position (every shard advances one document per
   * iteration, so depth = the largest shard's document count).
   */
  val curationPack: String =
    s"""WITH RECURSIVE d0 AS (
       |  SELECT doc_id,
       |    ((doc_id % $P) * 1103515245 + 12345) % $P % 16 AS shard,
       |    CAST(len(${toks("text")}) AS BIGINT) AS n_tokens
       |  FROM documents),
       |docs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS pos
       |  FROM d0),
       |pack AS (
       |  SELECT doc_id, shard, n_tokens, pos,
       |    CAST(1 AS BIGINT) AS bin, CAST(512 AS BIGINT) - n_tokens AS remaining
       |  FROM docs WHERE pos = 1
       |  UNION ALL
       |  SELECT d.doc_id, d.shard, d.n_tokens, d.pos,
       |    CASE WHEN d.n_tokens <= p.remaining THEN p.bin ELSE p.bin + 1 END,
       |    CASE WHEN d.n_tokens <= p.remaining THEN p.remaining - d.n_tokens
       |         ELSE CAST(512 AS BIGINT) - d.n_tokens END
       |  FROM pack p JOIN docs d ON d.shard = p.shard AND d.pos = p.pos + 1)
       |SELECT doc_id, shard, bin, n_tokens FROM pack""".stripMargin

  val curationContamination: String =
    s"""WITH testset AS (
       |  SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id + 6000000, text || ' extra-token' FROM documents WHERE doc_id % 2 = 1),
       |ttok AS (SELECT doc_id, list_transform(${toks("text")}, t -> ${poly("t")}) AS th FROM testset),
       |tfp AS (SELECT doc_id, $fpExpr AS fp FROM ttok),
       |rtok AS (SELECT list_transform(${toks("text")}, t -> ${poly("t")}) AS th FROM documents),
       |rfp AS (SELECT DISTINCT $fpExpr AS fp FROM rtok)
       |SELECT doc_id FROM tfp WHERE fp IN (SELECT fp FROM rfp)""".stripMargin

  /** End-to-end curation pipeline: nests the PROVEN textLangid /
    * textQualityScore oracles as CTEs, dedups by content (min id per
    * text ≡ exactDedup's min id per content hash), assigns splits with
    * the same arithmetic as curationSplits, and aggregates per split. */
  lazy val pipelineCorpusBuild: String = // lazy: nests vals declared below
    s"""WITH lang AS ($textLangid),
       |qual AS ($textQualityScore),
       |kept AS (SELECT d.doc_id, d.text FROM documents d
       |         JOIN lang l ON l.doc_id = d.doc_id
       |         JOIN qual q ON q.doc_id = d.doc_id
       |         WHERE l.lang_pred = 'en' AND q.quality > CAST(0.5 AS DOUBLE)),
       |dd AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM kept GROUP BY text),
       |u AS (SELECT doc_id,
       |  CAST(((doc_id % $P) * 1103515245 + 12345) % $P AS DOUBLE) / $P AS u FROM dd)
       |SELECT $split801010 AS split,
       |       CAST(count(*) AS BIGINT) AS n_docs, CAST(min(doc_id) AS BIGINT) AS min_id
       |FROM u GROUP BY 1""".stripMargin

  // ------------------------------------------------------- PQ (ann_pq_topk)

  /** Dimension-generic twins of the 64-d helpers, for the per-subspace
    * PQ codebooks. All folds left-to-right — the bit-exactness
    * contract with the Scala loops. */
  private def dotN(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${n + 1}), d -> $a[d] * $b[d])), (x, y) -> x + y)""".stripMargin

  private def sqN(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, ${n + 1}), d -> ($a[d] - $b[d]) * ($a[d] - $b[d]))),
       |  (x, y) -> x + y)""".stripMargin

  private def zerosN(n: Int): String =
    s"list_transform(range(0, $n), zz -> CAST(0.0 AS DOUBLE))"

  /** One Lloyd iteration `prev -> cur` over the CTE `$samp(id, v)` of
    * n-dim points — the generic twin of lloydIter (same assignment
    * tie-break, same sample-order element sums, empty clusters keep
    * their centroid). `ord` is the SAMPLE ORDER the Scala array holds
    * — the element-sum fold order, so it must match the engine's
    * sample selection ordering (plain id for the library builds, the
    * portable hash for the durable catalog index). */
  private def lloydIterN(samp: String, prev: String, cur: String, n: Int,
      ord: String = "id"): String =
    s"""a$cur AS (
       |  SELECT id, v, cid FROM (
       |    SELECT s.id, s.v, c.cid,
       |      row_number() OVER (PARTITION BY s.id
       |        ORDER BY ${sqN("s.v", "c.cent", n)}, c.cid) AS rn
       |    FROM $samp s, $prev c) t WHERE rn = 1),
       |$cur AS (
       |  SELECT p.cid,
       |    CASE WHEN g.cnt IS NULL THEN p.cent
       |         ELSE list_transform(range(1, ${n + 1}), i -> g.total[i] / g.cnt) END AS cent
       |  FROM $prev p LEFT JOIN (
       |    SELECT cid, CAST(count(*) AS DOUBLE) AS cnt,
       |      list_reduce(list_prepend(${zerosN(n)}, list(v ORDER BY $ord)),
       |        (acc, pt) -> list_transform(range(1, ${n + 1}), i -> acc[i] + pt[i])) AS total
       |    FROM a$cur GROUP BY cid) g ON g.cid = p.cid)""".stripMargin

  /**
   * Full SQL replication of Similarity.pqTopK (m=8 subspaces × 8 dims,
   * ks=16, sample=512, 3 Lloyd iterations, ADC shortlist 160, k=20):
   * normalization, every per-subspace codebook, code assignment
   * (cc − 2·dot argmin, first-index ties), the query LUT, the
   * left-fold ADC scores, and the exact re-rank all replay
   * bit-for-bit.
   */
  /** The per-subspace PQ codebook chains (training + assignment + query
    * LUT), shared by the PQ and IVF-PQ oracles. Expects CTEs
    * vn(id, vn), samp(id, vn), qn(q). */
  private def pqChainsSql(M: Int, sub: Int, ks: Int, iters: Int,
      sampTable: String = "samp", rowTable: String = "vn",
      ord: String = "id", qTable: String = "qn",
      perQuery: Boolean = false): String =
    (0 until M).map { mm =>
      val lo = mm * sub + 1; val hi = (mm + 1) * sub
      val it = (0 until iters)
        .map(t => lloydIterN(s"s$mm", s"p${mm}c$t", s"p${mm}c${t + 1}", sub,
          ord))
        .mkString(",\n")
      val qid = if (perQuery) "q.qid, " else ""
      s"""s$mm AS (SELECT id, list_slice(vn, $lo, $hi) AS v FROM $sampTable),
         |p${mm}c0 AS (SELECT CAST(row_number() OVER (ORDER BY $ord) AS BIGINT) AS cid, v AS cent
         |  FROM (SELECT id, v FROM s$mm ORDER BY $ord LIMIT $ks) init),
         |$it,
         |b$mm AS (SELECT cid, cent,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(1, ${sub + 1}), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
         |  FROM p${mm}c$iters),
         |asg$mm AS (SELECT id, cid FROM (
         |  SELECT n.id, c.cid,
         |    row_number() OVER (PARTITION BY n.id
         |      ORDER BY c.cc - 2.0 * ${dotN(s"list_slice(n.vn, $lo, $hi)", "c.cent", sub)}, c.cid) AS rn
         |  FROM $rowTable n, b$mm c) t WHERE rn = 1),
         |lut$mm AS (SELECT ${qid}b.cid, ${dotN(s"list_slice(q.q, $lo, $hi)", "b.cent", sub)} AS val
         |  FROM b$mm b, $qTable q)""".stripMargin
    }.mkString(",\n")

  private def pqAdcJoins(M: Int, perQuery: Boolean = false): String =
    (0 until M).map { mm =>
      val qj = if (perQuery) s" AND lut$mm.qid = qs.qid" else ""
      s"JOIN asg$mm ON asg$mm.id = vn.id JOIN lut$mm ON lut$mm.cid = asg$mm.cid$qj"
    }.mkString("\n  ")

  private def pqAdcSum(M: Int): String =
    (0 until M).map(mm => s"lut$mm.val").mkString(" + ")

  // vn/samp MATERIALIZED: the PQ/IVF oracles reference them from every
  // per-subspace chain, and DuckDB's default CTE inlining would re-open
  // the parquet file once per expansion (fd exhaustion at 8 chains x
  // residual indirection) — materializing computes each once
  private val vnPrefix =
    s"""vecs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |vn AS MATERIALIZED (SELECT id, list_transform(v, x -> x / sqrt(${dotN("v", "v", 64)})) AS vn FROM vecs),
       |samp AS MATERIALIZED (SELECT id, vn FROM vn ORDER BY id LIMIT 512),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dotN("v", "v", 64)})) AS q
       |       FROM vecs WHERE id = 7)""".stripMargin

  val annPqTopk: String =
    s"""WITH $vnPrefix,
       |${pqChainsSql(8, 8, 16, 3)},
       |adc AS (SELECT vn.id, ${pqAdcSum(8)} AS adc
       |  FROM vn
       |  ${pqAdcJoins(8)}),
       |short AS (SELECT id FROM adc ORDER BY adc DESC, id LIMIT 160)
       |SELECT vec_id, cos FROM (
       |  SELECT s.id AS vec_id, ${dotN("vn.vn", "qn.q", 64)} AS cos
       |  FROM short s JOIN vn ON vn.id = s.id, qn
       |  ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin

  /**
   * IVF-PQ replication: the coarse quantizer (16 centroids, 5 Lloyd
   * iterations over the NORMALIZED sample) prunes to the query's 6
   * nearest lists; the shared PQ chains score the candidates by ADC;
   * exact re-rank of the 160-shortlist. Every stage replays the Scala
   * arithmetic bit-for-bit.
   */
  val annIvfPqTopk: String = {
    val coarse = (0 until 5)
      .map(t => lloydIterN("sampv", s"cc$t", s"cc${t + 1}", 64)).mkString(",\n")
    s"""WITH $vnPrefix,
       |sampv AS (SELECT id, vn AS v FROM samp),
       |cc0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS cid, v AS cent
       |  FROM (SELECT id, v FROM sampv ORDER BY id LIMIT 16) init),
       |$coarse,
       |bcoarse AS (SELECT cid, cent,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
       |  FROM cc5),
       |asgc AS MATERIALIZED (SELECT id, cid FROM (
       |  SELECT n.id, c.cid,
       |    row_number() OVER (PARTITION BY n.id
       |      ORDER BY c.cc - 2.0 * ${dotN("n.vn", "c.cent", 64)}, c.cid) AS rn
       |  FROM vn n, bcoarse c) t WHERE rn = 1),
       |rvn AS MATERIALIZED (
       |  SELECT n.id, list_transform(range(1, 65), i -> n.vn[i] - c.cent[i]) AS vn
       |  FROM vn n JOIN asgc ON asgc.id = n.id JOIN bcoarse c ON c.cid = asgc.cid),
       |rsamp AS MATERIALIZED (SELECT r.id, r.vn FROM rvn r JOIN samp s ON s.id = r.id),
       |probe AS (SELECT cid FROM (
       |  SELECT c.cid, ${sqN("c.cent", "qn.q", 64)} AS d FROM cc5 c, qn) t
       |  ORDER BY d, cid LIMIT 6),
       |qc AS (SELECT c.cid, ${dotN("c.cent", "qn.q", 64)} AS val FROM cc5 c, qn),
       |${pqChainsSql(8, 8, 16, 3, sampTable = "rsamp", rowTable = "rvn")},
       |adc AS (SELECT vn.id, qc.val + (${pqAdcSum(8)}) AS adc
       |  FROM vn
       |  JOIN asgc ON asgc.id = vn.id JOIN probe ON probe.cid = asgc.cid
       |  JOIN qc ON qc.cid = asgc.cid
       |  ${pqAdcJoins(8)}),
       |short AS (SELECT id FROM adc ORDER BY adc DESC, id LIMIT 320)
       |SELECT vec_id, cos FROM (
       |  SELECT s.id AS vec_id, ${dotN("vn.vn", "qn.q", 64)} AS cos
       |  FROM short s JOIN vn ON vn.id = s.id, qn
       |  ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin
  }

  /**
   * Batch-ANN replication: per-query exact cosine top-k via a cross
   * join + window — what the engine's IVF batch join equals at
   * nprobe = nlist. Same unrolled dot fold and DOUBLE[] casts as the
   * engine, so scores match bit-for-bit.
   */
  val annBatchTopk: String =
    s"""WITH vecs AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qs AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS q
       |  FROM embeddings WHERE vec_id % 101 = 7),
       |scored AS (
       |  SELECT qs.qid, vecs.id AS vec_id,
       |    ${dot64("qs.q", "vecs.v")} /
       |      (sqrt(${dot64("qs.q", "qs.q")}) * sqrt(${dot64("vecs.v", "vecs.v")})) AS cos
       |  FROM qs, vecs)
       |SELECT qid, vec_id, cos FROM (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 5""".stripMargin

  /**
   * Batch probe over the mutated catalog table: per-query exact
   * cosine top-5 (cross join + window) over the live content — what
   * graft_ann_batch at nprobe = nlist equals for every query.
   */
  val annCatalogBatchTopk: String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id % 97 <> 3),
       |ins AS (
       |  SELECT vec_id + 100000 AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 8),
       |vecs AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
       |qs AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS q
       |  FROM embeddings WHERE vec_id IN (7, 20, 33)),
       |scored AS (
       |  SELECT qs.qid, vecs.id AS vec_id,
       |    ${dot64("qs.q", "vecs.v")} /
       |      (sqrt(${dot64("qs.q", "qs.q")}) * sqrt(${dot64("vecs.v", "vecs.v")})) AS cos
       |  FROM qs, vecs)
       |SELECT qid, vec_id, cos FROM (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 5""".stripMargin

  /**
   * Filtered vector search over the mutated catalog table: exact
   * brute-force cosine top-k restricted to rows matching the lane's
   * predicate (`label % 3 = 0 AND vec_id <> 11`) — the k best AMONG
   * matching live rows. Appended twins (+100000) carry their source
   * row's label; deleted keys (`% 97 = 3`) drop out.
   */
  val annCatalogFilteredTopk: String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings WHERE vec_id % 97 <> 3),
       |ins AS (
       |  SELECT vec_id + 100000 AS id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings WHERE vec_id < 8),
       |vecs AS (
       |  SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
       |  WHERE label % 3 = 0 AND id <> 11),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dot64("v", "v")})) AS q
       |       FROM (SELECT CAST(embedding AS DOUBLE[]) AS v
       |             FROM embeddings WHERE vec_id = 7)),
       |scored AS (
       |  SELECT vecs.id AS vec_id,
       |    ${dot64("vecs.v", "qn.q")} / sqrt(${dot64("vecs.v", "vecs.v")}) AS cos
       |  FROM vecs, qn)
       |SELECT vec_id, cos FROM (
       |  SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin

  /**
   * Durable-IVFPQ replication over the MUTATED catalog table: the
   * coarse quantizer and residual PQ codebooks train on the ORIGINAL
   * corpus's first-512 sample (what CREATE INDEX saw); the live rows
   * (corpus minus the deleted keys, plus the +100000 re-inserts)
   * assign coarse lists and residual codes against those SAVED
   * books — appended twins get the same codes as their originals by
   * construction; nprobe = nlist probes every list; the ADC
   * 320-shortlist re-ranks by EXACT cosine against the raw (live)
   * vectors, mirroring the engine's re-rank join to the primary.
   */
  /** The engine's portable sample-selection hash over a BIGINT key
    * ([[graft.sql.GraftVectorIndex.sampleOrder]]) — pure modular
    * arithmetic, bit-identical in DuckDB (non-negative ids, no
    * overflow), with the key itself as tie-break. This IS the order
    * the engine's training-sample ARRAY holds, so every
    * sample-order-sensitive fold below must use it. */
  private val catSampOrd =
    "((id % 999999937) * 2654435761) % 1000000007, id"

  val annCatalogPqTopk: String = {
    val coarse = (0 until 5)
      .map(t => lloydIterN("sampv", s"cc$t", s"cc${t + 1}", 64, catSampOrd))
      .mkString(",\n")
    s"""WITH vecs0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |vn0 AS MATERIALIZED (SELECT id, list_transform(v, x -> x / sqrt(${dotN("v", "v", 64)})) AS vn FROM vecs0),
       |samp AS MATERIALIZED (SELECT id, vn FROM vn0 ORDER BY $catSampOrd LIMIT 512),
       |vn AS MATERIALIZED (
       |  SELECT id, vn FROM vn0 WHERE id % 97 <> 3
       |  UNION ALL SELECT id + 100000 AS id, vn FROM vn0 WHERE id < 8),
       |raws AS MATERIALIZED (
       |  SELECT id, v FROM vecs0 WHERE id % 97 <> 3
       |  UNION ALL SELECT id + 100000 AS id, v FROM vecs0 WHERE id < 8),
       |qn AS (SELECT vn AS q FROM vn0 WHERE id = 7),
       |sampv AS (SELECT id, vn AS v FROM samp),
       |cc0 AS (SELECT CAST(row_number() OVER (ORDER BY $catSampOrd) AS BIGINT) AS cid, v AS cent
       |  FROM (SELECT id, v FROM sampv ORDER BY $catSampOrd LIMIT 16) init),
       |$coarse,
       |bcoarse AS (SELECT cid, cent,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
       |  FROM cc5),
       |asgc AS MATERIALIZED (SELECT id, cid FROM (
       |  SELECT n.id, c.cid,
       |    row_number() OVER (PARTITION BY n.id
       |      ORDER BY c.cc - 2.0 * ${dotN("n.vn", "c.cent", 64)}, c.cid) AS rn
       |  FROM vn n, bcoarse c) t WHERE rn = 1),
       |rvn AS MATERIALIZED (
       |  SELECT n.id, list_transform(range(1, 65), i -> n.vn[i] - c.cent[i]) AS vn
       |  FROM vn n JOIN asgc ON asgc.id = n.id JOIN bcoarse c ON c.cid = asgc.cid),
       |asgs AS (SELECT id, cid FROM (
       |  SELECT s.id, c.cid,
       |    row_number() OVER (PARTITION BY s.id
       |      ORDER BY c.cc - 2.0 * ${dotN("s.v", "c.cent", 64)}, c.cid) AS rn
       |  FROM sampv s, bcoarse c) t WHERE rn = 1),
       |rsamp AS MATERIALIZED (
       |  SELECT s.id, list_transform(range(1, 65), i -> s.v[i] - c.cent[i]) AS vn
       |  FROM sampv s JOIN asgs ON asgs.id = s.id JOIN bcoarse c ON c.cid = asgs.cid),
       |probe AS (SELECT cid FROM (
       |  SELECT c.cid, ${sqN("c.cent", "qn.q", 64)} AS d FROM cc5 c, qn) t
       |  ORDER BY d, cid LIMIT 16),
       |qc AS (SELECT c.cid, ${dotN("c.cent", "qn.q", 64)} AS val FROM cc5 c, qn),
       |${pqChainsSql(8, 8, 16, 3, sampTable = "rsamp", rowTable = "rvn",
          ord = catSampOrd)},
       |adc AS (SELECT vn.id, qc.val + (${pqAdcSum(8)}) AS adc
       |  FROM vn
       |  JOIN asgc ON asgc.id = vn.id JOIN probe ON probe.cid = asgc.cid
       |  JOIN qc ON qc.cid = asgc.cid
       |  ${pqAdcJoins(8)}),
       |short AS (SELECT id FROM adc ORDER BY adc DESC, id LIMIT 320)
       |SELECT vec_id, cos FROM (
       |  SELECT s.id AS vec_id,
       |    ${dotN("r.v", "qn.q", 64)} / sqrt(${dotN("r.v", "r.v", 64)}) AS cos
       |  FROM short s JOIN raws r ON r.id = s.id, qn
       |  ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin
  }

  /**
   * Batch durable-IVFPQ replication over the MUTATED catalog table:
   * the same trained-on-original-sample coarse/codebook chains as
   * [[annCatalogPqTopk]] (hash-ordered sample — the engine's
   * selection), then for EVERY query (ids 7/20/33) a per-query ADC
   * LUT, per-query 16·k shortlist (nprobe = nlist probes every
   * list), and per-query exact-cosine re-rank against the raw live
   * vectors — what graft_ann_batch computes in one job.
   */
  val annCatalogBatchPqTopk: String = {
    val coarse = (0 until 5)
      .map(t => lloydIterN("sampv", s"cc$t", s"cc${t + 1}", 64, catSampOrd))
      .mkString(",\n")
    s"""WITH vecs0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |vn0 AS MATERIALIZED (SELECT id, list_transform(v, x -> x / sqrt(${dotN("v", "v", 64)})) AS vn FROM vecs0),
       |samp AS MATERIALIZED (SELECT id, vn FROM vn0 ORDER BY $catSampOrd LIMIT 512),
       |vn AS MATERIALIZED (
       |  SELECT id, vn FROM vn0 WHERE id % 97 <> 3
       |  UNION ALL SELECT id + 100000 AS id, vn FROM vn0 WHERE id < 8),
       |raws AS MATERIALIZED (
       |  SELECT id, v FROM vecs0 WHERE id % 97 <> 3
       |  UNION ALL SELECT id + 100000 AS id, v FROM vecs0 WHERE id < 8),
       |qs AS (SELECT id AS qid, vn AS q FROM vn0 WHERE id IN (7, 20, 33)),
       |qraw AS (SELECT id AS qid, v AS q FROM vecs0 WHERE id IN (7, 20, 33)),
       |sampv AS (SELECT id, vn AS v FROM samp),
       |cc0 AS (SELECT CAST(row_number() OVER (ORDER BY $catSampOrd) AS BIGINT) AS cid, v AS cent
       |  FROM (SELECT id, v FROM sampv ORDER BY $catSampOrd LIMIT 16) init),
       |$coarse,
       |bcoarse AS (SELECT cid, cent,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
       |  FROM cc5),
       |asgc AS MATERIALIZED (SELECT id, cid FROM (
       |  SELECT n.id, c.cid,
       |    row_number() OVER (PARTITION BY n.id
       |      ORDER BY c.cc - 2.0 * ${dotN("n.vn", "c.cent", 64)}, c.cid) AS rn
       |  FROM vn n, bcoarse c) t WHERE rn = 1),
       |rvn AS MATERIALIZED (
       |  SELECT n.id, list_transform(range(1, 65), i -> n.vn[i] - c.cent[i]) AS vn
       |  FROM vn n JOIN asgc ON asgc.id = n.id JOIN bcoarse c ON c.cid = asgc.cid),
       |asgs AS (SELECT id, cid FROM (
       |  SELECT s.id, c.cid,
       |    row_number() OVER (PARTITION BY s.id
       |      ORDER BY c.cc - 2.0 * ${dotN("s.v", "c.cent", 64)}, c.cid) AS rn
       |  FROM sampv s, bcoarse c) t WHERE rn = 1),
       |rsamp AS MATERIALIZED (
       |  SELECT s.id, list_transform(range(1, 65), i -> s.v[i] - c.cent[i]) AS vn
       |  FROM sampv s JOIN asgs ON asgs.id = s.id JOIN bcoarse c ON c.cid = asgs.cid),
       |qc AS (SELECT q.qid, c.cid, ${dotN("c.cent", "q.q", 64)} AS val FROM cc5 c, qs q),
       |${pqChainsSql(8, 8, 16, 3, sampTable = "rsamp", rowTable = "rvn",
          ord = catSampOrd, qTable = "qs", perQuery = true)},
       |adc AS (SELECT qs.qid, vn.id, qc.val + (${pqAdcSum(8)}) AS adc
       |  FROM vn
       |  JOIN asgc ON asgc.id = vn.id
       |  CROSS JOIN qs
       |  JOIN qc ON qc.cid = asgc.cid AND qc.qid = qs.qid
       |  ${pqAdcJoins(8, perQuery = true)}),
       |short AS (SELECT qid, id FROM (
       |  SELECT qid, id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, id) AS rn
       |  FROM adc) t WHERE rn <= 80),
       |scored AS (
       |  SELECT s.qid, s.id AS vec_id,
       |    ${dotN("qr.q", "r.v", 64)} /
       |      (sqrt(${dotN("qr.q", "qr.q", 64)}) * sqrt(${dotN("r.v", "r.v", 64)})) AS cos
       |  FROM short s JOIN raws r ON r.id = s.id JOIN qraw qr ON qr.qid = s.qid)
       |SELECT qid, vec_id, cos FROM (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  /**
   * Filtered BATCH vector search over the mutated catalog table:
   * per-query exact cosine top-5 restricted to live rows matching the
   * lane's predicate (`label % 3 = 0 AND vec_id <> 11`) — the k best
   * AMONG matching rows per query, what graft_ann_batch's filter arg
   * computes at nprobe = nlist.
   */
  val annCatalogBatchFilteredTopk: String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings WHERE vec_id % 97 <> 3),
       |ins AS (
       |  SELECT vec_id + 100000 AS id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings WHERE vec_id < 8),
       |vecs AS (
       |  SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
       |  WHERE label % 3 = 0 AND id <> 11),
       |qs AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS q
       |  FROM embeddings WHERE vec_id IN (7, 20, 33)),
       |scored AS (
       |  SELECT qs.qid, vecs.id AS vec_id,
       |    ${dot64("qs.q", "vecs.v")} /
       |      (sqrt(${dot64("qs.q", "qs.q")}) * sqrt(${dot64("vecs.v", "vecs.v")})) AS cos
       |  FROM qs, vecs)
       |SELECT qid, vec_id, cos FROM (
       |  SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 5""".stripMargin

  /**
   * Semantic-dedup replication: the coarse quantizer chain is the
   * IVF one verbatim (16 centroids, 5 Lloyd iterations over the
   * normalized sample, cc − 2·dot assignment with first-cid ties);
   * pairs join WITHIN a cluster only and verify by exact dot — the
   * same candidates, the same verdicts, bit-for-bit.
   */
  val dedupSemantic: String = {
    val coarse = (0 until 5)
      .map(t => lloydIterN("sampv", s"cc$t", s"cc${t + 1}", 64)).mkString(",\n")
    s"""WITH $vnPrefix,
       |sampv AS (SELECT id, vn AS v FROM samp),
       |cc0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS cid, v AS cent
       |  FROM (SELECT id, v FROM sampv ORDER BY id LIMIT 16) init),
       |$coarse,
       |bcoarse AS (SELECT cid, cent,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
       |  FROM cc5),
       |asgc AS MATERIALIZED (SELECT id, cid FROM (
       |  SELECT n.id, c.cid,
       |    row_number() OVER (PARTITION BY n.id
       |      ORDER BY c.cc - 2.0 * ${dotN("n.vn", "c.cent", 64)}, c.cid) AS rn
       |  FROM vn n, bcoarse c) t WHERE rn = 1)
       |SELECT a, b, round(cos, 2) AS cos FROM (
       |  SELECT x.id AS a, y.id AS b, ${dotN("va.vn", "vb.vn", 64)} AS cos
       |  FROM asgc x JOIN asgc y ON x.cid = y.cid AND x.id < y.id
       |  JOIN vn va ON va.id = x.id JOIN vn vb ON vb.id = y.id) p
       |WHERE cos > 0.4""".stripMargin
  }

  /** Sketches.RowConsts as a VALUES table — literals must equal the
    * Scala constants or every sketch oracle desynchronizes. */
  private def sketchConsts(depth: Int): String =
    graft.pipeline.Sketches.RowConsts.take(depth).zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }
      .mkString("SELECT * FROM (VALUES ", ", ", ") AS v(j, a, b)")

  /** Count-min matrix + estimates for the top-30 tokens: identical
    * d×w counters, identical min-over-rows estimates. */
  val sketchHeavyHitters: String =
    s"""WITH rawtok AS (SELECT unnest(${toks("text")}) AS token FROM documents),
       |tok AS (SELECT token, ${poly("token")} AS h FROM rawtok WHERE token <> ''),
       |consts AS (${sketchConsts(4)}),
       |counters AS (
       |  SELECT j, ((a * h + b) % $P) % 2048 AS pos, CAST(count(*) AS BIGINT) AS c
       |  FROM tok CROSS JOIN consts GROUP BY 1, 2),
       |top AS (
       |  SELECT token, h, CAST(count(*) AS BIGINT) AS freq
       |  FROM tok GROUP BY 1, 2 ORDER BY freq DESC, token LIMIT 30)
       |SELECT t.token, t.freq, min(c.c) AS cm_est
       |FROM top t CROSS JOIN consts r
       |JOIN counters c ON c.j = r.j AND c.pos = ((r.a * t.h + r.b) % $P) % 2048
       |GROUP BY 1, 2""".stripMargin

  /** KMV distinct-count estimates per event_type: same affine hash,
    * same k-th minimum, same (k-1)·P/h_(k) arithmetic. The engine side
    * keeps only a bounded k-long sketch per group; the oracle
    * recomputes its observable outputs (n_kept = min(distinct, k),
    * kth-smallest hash) exactly from the full key set. */
  val sketchDistinctKmv: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |  ((user_id % $P) * 1103515245 + 12345) % $P AS h FROM events
       |  WHERE user_id IS NOT NULL),
       |r AS (SELECT event_type, h,
       |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |a AS (SELECT event_type,
       |             CAST(LEAST(count(*), 64) AS BIGINT) AS n_kept,
       |             max(CASE WHEN rn = 64 THEN h END) AS kth
       |      FROM r GROUP BY 1)
       |SELECT event_type, n_kept,
       |  CASE WHEN kth IS NULL THEN CAST(n_kept AS DOUBLE)
       |       ELSE CAST(63 AS DOUBLE) * CAST(2147483647 AS DOUBLE)
       |            / CAST(kth AS DOUBLE) END AS kmv_est
       |FROM a""".stripMargin

  /** HLL register summary per event_type: same affine hash, same
    * top-8-bit register split, same leading-zero rank (a comparison
    * cascade, no transcendental log), same exact Σ 2^-M and fixed-order
    * α·m²/Σ — all three output columns bit-identical. */
  val sketchDistinctHll: String = {
    val p = 8; val m = 1 << p; val w = 31 - p
    val rhoCase = (1 to w).map(j =>
      s"WHEN rest >= ${1L << (w - j)} THEN $j").mkString(" ")
    s"""WITH h AS (SELECT event_type,
       |  ((user_id % $P) * 1103515245 + 12345) % $P AS hh FROM events
       |  WHERE user_id IS NOT NULL),
       |s AS (SELECT event_type, hh >> $w AS reg,
       |             hh & ${(1L << w) - 1} AS rest FROM h),
       |rr AS (SELECT event_type, reg,
       |  CASE $rhoCase ELSE ${w + 1} END AS rho FROM s),
       |mr AS (SELECT event_type, reg, max(rho) AS mrho FROM rr GROUP BY 1, 2),
       |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS hll_used,
       |  sum(1.0 / CAST((CAST(1 AS BIGINT) << mrho) AS DOUBLE)) AS ss
       |  FROM mr GROUP BY 1)
       |SELECT event_type, hll_used,
       |  ss + ($m.0 - CAST(hll_used AS DOUBLE)) AS hll_sum_inv,
       |  (0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0
       |    / (ss + ($m.0 - CAST(hll_used AS DOUBLE))) AS hll_raw
       |FROM agg""".stripMargin
  }

  /** Bloom prune of customers by Q1-1995 buyer keys: identical bit
    * positions, identical membership decisions — INCLUDING the
    * deterministic false positives (is_member = false rows). */
  val sketchBloomPrune: String =
    s"""WITH consts AS (${sketchConsts(3)}),
       |bh AS (SELECT DISTINCT o_custkey % $P AS h FROM orders
       |       WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-03-31'),
       |bits AS (SELECT DISTINCT j, ((a * h + b) % $P) % 4096 AS pos
       |         FROM bh CROSS JOIN consts),
       |cand AS (
       |  SELECT c.c_custkey
       |  FROM customer c CROSS JOIN consts r
       |  JOIN bits ON bits.j = r.j
       |           AND bits.pos = ((r.a * (c.c_custkey % $P) + r.b) % $P) % 4096
       |  GROUP BY 1 HAVING count(*) = 3),
       |mem AS (SELECT DISTINCT o_custkey FROM orders
       |        WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-03-31')
       |SELECT cand.c_custkey, (mem.o_custkey IS NOT NULL) AS is_member
       |FROM cand LEFT JOIN mem ON mem.o_custkey = cand.c_custkey""".stripMargin

  /** Fixed-width histogram quantiles over events.value per event_type:
    * identical bounds, identical bin ids, identical cumulative counts,
    * identical in-bin interpolation — all plain IEEE ops in the same
    * order as Sketches.histogramQuantiles(bins=64). */
  val sketchQuantiles: String =
    """WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
      |b AS (SELECT event_type, min(value) AS mn, max(value) AS mx,
      |             CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |bin AS (SELECT e.event_type,
      |  CAST(CASE WHEN (b.mx - b.mn) / 64.0 = 0 THEN 0
      |            ELSE least(floor((e.value - b.mn) / ((b.mx - b.mn) / 64.0)), 63.0)
      |       END AS BIGINT) AS bin
      |  FROM v e JOIN b USING (event_type)),
      |h AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS c
      |      FROM bin GROUP BY 1, 2),
      |cum AS (SELECT h.*, sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
      |        FROM h),
      |qs AS (SELECT CAST(q AS DOUBLE) AS q
      |       FROM (VALUES (0.25), (0.5), (0.9), (0.99)) AS t(q)),
      |wq AS (SELECT cum.*, b.mn, b.mx, b.n, qs.q
      |       FROM cum JOIN b USING (event_type) CROSS JOIN qs),
      |f AS (SELECT *, row_number() OVER (PARTITION BY event_type, q ORDER BY bin) AS rn
      |      FROM wq WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
      |SELECT event_type, q,
      |  mn + (mx - mn) / 64.0 * CAST(bin AS DOUBLE)
      |     + (mx - mn) / 64.0 * (q * CAST(n AS DOUBLE) - CAST(cum - c AS DOUBLE))
      |       / CAST(c AS DOUBLE) AS est
      |FROM f WHERE rn = 1""".stripMargin

  /** 13-gram strings with the shorter-than-n whole-text fallback over a
    * `toks` list column — mirrors TextFunctions.shingleHashes(n=13)'s
    * windowing. */
  private val grams13 =
    """CASE WHEN len(toks) < 13 THEN [array_to_string(toks, ' ')]
      |     ELSE list_transform(range(1, len(toks) - 11),
      |                         i -> array_to_string(list_slice(toks, i, i + 12), ' ')) END""".stripMargin

  /** Token-budget slice — mirrors Curation.tokenBudgetSample's
    * semantics directly: the bucketed two-phase prefix in Spark equals
    * this single running sum in global (hash, id) order. */
  val curationTokenBudget: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
       |  ((doc_id % $P) * 69069 + 362437) % $P AS u FROM documents)
       |SELECT doc_id, n_tokens FROM t
       |QUALIFY sum(n_tokens) OVER (ORDER BY u, doc_id) <= 20000""".stripMargin

  /** Epoch training order — mirrors Curation.trainingOrder(seed = 1):
    * the bucketed two-phase rank equals one global row_number in
    * (u, id) order; 1610467359 = (1103515245 + 1*2654435761) mod P. */
  val curationOrder: String =
    s"""SELECT doc_id,
       |  row_number() OVER (
       |    ORDER BY ((doc_id % $P) * 1610467359 + 362437) % $P, doc_id) - 1 AS pos
       |FROM documents""".stripMargin

  /** Gopher-rule quality filter — mirrors Curation.qualityFilter at
    * the registered lane's thresholds. Every signal is the bit-exact
    * twin of an already-gated lane (text_quality's mean token length /
    * stopword ratio, text_repetition's fractions), so the threshold
    * comparisons agree exactly across engines. */
  val curationQualityFilter: String =
    s"""WITH tok AS (SELECT doc_id, trim(text) AS tx, ${toks("text")} AS toks
       |             FROM documents),
       |g2 AS (SELECT doc_id, unnest(
       |  CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(range(1, len(toks)),
       |                           i -> toks[i] || ' ' || toks[i+1]) END) AS g
       |  FROM tok),
       |c2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
       |       FROM g2 GROUP BY 1, 2),
       |s2 AS (SELECT doc_id,
       |         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2
       |       FROM c2 GROUP BY 1),
       |g3 AS (SELECT doc_id, unnest($grams3) AS g FROM tok),
       |c3 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
       |       FROM g3 GROUP BY 1, 2),
       |s3 AS (SELECT doc_id,
       |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |           / CAST(sum(c) AS DOUBLE) AS dup3
       |       FROM c3 GROUP BY 1),
       |q AS (SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n,
       |  CAST(length(replace(tx, ' ', '')) AS DOUBLE) / len(toks) AS mtl,
       |  CAST(len(list_filter(toks,
       |      w -> w IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
       |    / len(toks) AS stop
       |  FROM tok)
       |SELECT q.doc_id,
       |  n >= 25 AND n <= 100000 AS ok_len,
       |  mtl >= 3.0 AND mtl <= 10.0 AS ok_wordlen,
       |  stop >= 0.02 AS ok_stop,
       |  top2 <= 0.11 AND dup3 <= 0.18 AS ok_rep,
       |  (n >= 25 AND n <= 100000) AND (mtl >= 3.0 AND mtl <= 10.0)
       |    AND stop >= 0.02 AND (top2 <= 0.11 AND dup3 <= 0.18) AS keep
       |FROM q JOIN s2 ON s2.doc_id = q.doc_id JOIN s3 ON s3.doc_id = q.doc_id""".stripMargin

  /** Data-mixture slice — mirrors Curation.mixtureSample: the same
    * running-sum keep rule as [[curationTokenBudget]], partitioned by
    * source against a per-source budget. */
  val curationMixture: String =
    s"""WITH t AS (SELECT doc_id, source,
       |  CAST(len(${toks("text")}) AS BIGINT) AS n_tokens,
       |  ((doc_id % $P) * 69069 + 362437) % $P AS u FROM documents),
       |b AS (SELECT * FROM (VALUES ('src3', 700), ('src8', 300),
       |                            ('src12', 1000000)) v(source, budget))
       |SELECT doc_id, source, n_tokens FROM t JOIN b USING (source)
       |QUALIFY sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id)
       |  <= budget""".stripMargin

  /** GPT-3-style 13-gram decontamination — mirrors
    * Curation.contaminationNgram over the truncated-eval-set lane. */
  val curationDecontaminateNgram: String =
    s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |tt AS (SELECT list_slice(toks, 1, 30) AS toks FROM tok
       |       WHERE doc_id % 100 = 0),
       |tg AS (SELECT DISTINCT unnest(list_transform($grams13,
       |         g -> ${poly("g")})) AS h FROM tt),
       |rg AS (SELECT doc_id, unnest(list_transform($grams13,
       |         g -> ${poly("g")})) AS h FROM tok)
       |SELECT DISTINCT doc_id FROM rg JOIN tg USING (h)""".stripMargin

  /** Within-document repetition — mirrors
    * Curation.repetitionSignals: word n-grams with the shorter-than-n
    * whole-text fallback, exact integer counts, IEEE double division
    * (bit-identical cross-engine on exact integer operands). */
  val textRepetition: String =
    s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |g2 AS (SELECT doc_id, unnest(
       |  CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(range(1, len(toks)),
       |                           i -> toks[i] || ' ' || toks[i+1]) END) AS g
       |  FROM tok),
       |c2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
       |       FROM g2 GROUP BY 1, 2),
       |s2 AS (SELECT doc_id,
       |         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top2_frac
       |       FROM c2 GROUP BY 1),
       |g3 AS (SELECT doc_id, unnest($grams3) AS g FROM tok),
       |c3 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
       |       FROM g3 GROUP BY 1, 2),
       |s3 AS (SELECT doc_id,
       |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |           / CAST(sum(c) AS DOUBLE) AS dup3_frac
       |       FROM c3 GROUP BY 1)
       |SELECT doc_id, top2_frac, dup3_frac
       |FROM s2 JOIN s3 USING (doc_id)""".stripMargin

  /** Containment over the same banded-minhash candidates as
    * dedupNgram: |A∩B| / min(|A|,|B|), threshold 0.9. */
  val dedupContainment: String =
    s"""WITH $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |gh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tok),
       |sg AS (SELECT doc_id, $sigExpr AS sig FROM gh),
       |bd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sg),
       |${candCte(1000)}
       |SELECT c.a, c.b,
       |  CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
       |    / least(len(ha.hs), len(hb.hs)) AS containment
       |FROM cand c JOIN gh ha ON ha.doc_id = c.a JOIN gh hb ON hb.doc_id = c.b
       |WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
       |    / least(len(ha.hs), len(hb.hs)) >= 0.9""".stripMargin

  /** Stratified sample — the same per-group hash rank. */
  val curationSampleStratified: String =
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ((doc_id % $P) * 69069 + 362437) % $P, doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= 20""".stripMargin

  /** Smallest-k deterministic sample — same affine hash, same ties. */
  val curationSample: String =
    s"""SELECT doc_id, source FROM documents
       |ORDER BY ((doc_id % $P) * 69069 + 362437) % $P, doc_id LIMIT 100""".stripMargin

  /** Mean inverse token frequency per doc: exact corpus wordcount,
    * then a position-ordered left fold of IEEE divisions — the same
    * double bit-for-bit in both engines. */
  val textRarity: String =
    s"""WITH tokd AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |x AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM tokd),
       |tok AS (SELECT doc_id, pos, toks[pos] AS tok FROM x WHERE toks[pos] <> ''),
       |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
       |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       |             list(CAST(1 AS DOUBLE) / cnt ORDER BY pos) AS l
       |      FROM tok JOIN f USING (tok) GROUP BY 1)
       |SELECT doc_id, n_scored,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), l),
       |              (acc, x) -> acc + x) / n_scored AS rarity
       |FROM d""".stripMargin

  val textVocab: String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS freq
       |FROM (SELECT unnest(${toks("text")}) AS token FROM documents) t
       |WHERE token <> ''
       |GROUP BY token
       |ORDER BY freq DESC, token LIMIT 100""".stripMargin

  val textSubwords: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS BIGINT)
      |    AS n_subwords
      |FROM documents""".stripMargin

  private def stopList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(",")

  private val enStop = stopList(TextFunctions.LangProfiles.en)

  /** Quality formula over an arbitrary (doc_id, text) relation —
    * mirrors TextFunctions.qualityScore; parameterized so the keeper
    * election can score the planted corpus, not just `documents`. */
  private def qualitySql(src: String): String =
    s"""WITH t AS (SELECT doc_id, text, ${toks("text")} AS toks FROM $src),
       |m AS (SELECT doc_id,
       |  CAST(len(toks) AS DOUBLE) AS n,
       |  CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(length(regexp_replace(trim(text), '[ \\t\\n\\x0b\\f\\r]', '', 'g')) AS DOUBLE) / len(toks) END AS tl,
       |  CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(len(list_filter(toks, w -> w IN ($enStop))) AS DOUBLE) / len(toks) END AS swr
       |  FROM t)
       |SELECT doc_id,
       |  least(n / CAST(50.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
       |  + CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + abs(tl - CAST(4.5 AS DOUBLE))) * CAST(0.3 AS DOUBLE)
       |  + least(swr * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE) AS quality
       |FROM m""".stripMargin

  val textQualityScore: String = qualitySql("documents")

  /** Quality-aware keeper election: the dedupClusters closure +
    * per-cluster argmax quality (ties -> min id) over the corpus. */
  val dedupKeeperQuality: String =
    s"""WITH RECURSIVE $corpusCte,
       |tok AS (SELECT doc_id, ${toks("text")} AS toks FROM corpus),
       |gh AS (SELECT doc_id,
       |  list_distinct(list_transform($grams3, g -> ${poly("g")})) AS hs FROM tok),
       |sg AS (SELECT doc_id, $sigExpr AS sig FROM gh),
       |bd AS (SELECT doc_id, unnest($bandsExpr) AS bk FROM sg),
       |${candCte(1000)},
       |prs AS (
       |  SELECT c.a, c.b
       |  FROM cand c JOIN sg sa ON sa.doc_id = c.a JOIN sg sb ON sb.doc_id = c.b
       |  WHERE len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) >= 32),
       |edges AS (SELECT a AS src, b AS dst FROM prs
       |          UNION SELECT b AS src, a AS dst FROM prs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
       |clusters AS (SELECT id, CAST(min(r) AS BIGINT) AS cluster FROM reach GROUP BY id),
       |qual AS (${qualitySql("corpus")})
       |SELECT cluster, id AS keeper_id, quality FROM (
       |  SELECT c.cluster, c.id, q.quality,
       |    row_number() OVER (PARTITION BY c.cluster
       |      ORDER BY q.quality DESC, c.id) AS rn
       |  FROM clusters c JOIN qual q ON q.doc_id = c.id) t
       |WHERE rn = 1""".stripMargin

  private def stopRatio(words: String): String =
    s"""CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
       |     ELSE CAST(len(list_filter(toks, w -> w IN ($words))) AS DOUBLE) / len(toks) END""".stripMargin

  val textLangid: String =
    s"""WITH t AS (SELECT doc_id, text, ${toks("text")} AS toks FROM documents),
       |s AS (SELECT doc_id,
       |  ${stopRatio(stopList(TextFunctions.LangProfiles.en))} AS s_en,
       |  ${stopRatio(stopList(TextFunctions.LangProfiles.es))} AS s_es,
       |  ${stopRatio(stopList(TextFunctions.LangProfiles.de))} AS s_de,
       |  ${stopRatio(stopList(TextFunctions.LangProfiles.fr))} AS s_fr,
       |  CAST(length(regexp_replace(text, '[^\\p{Han}]', '', 'g')) AS DOUBLE) AS cjk,
       |  length(text) AS n
       |  FROM t),
       |b AS (SELECT doc_id,
       |  greatest(s_en, s_es, s_de, s_fr) AS best_s,
       |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'und'
       |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
       |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
       |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
       |       ELSE 'fr' END AS lang0,
       |  CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE least(cjk * CAST(3.0 AS DOUBLE) / greatest(n, 1), CAST(1.0 AS DOUBLE)) END AS zh_conf
       |  FROM s)
       |SELECT doc_id,
       |  CASE WHEN zh_conf > CAST(0.15 AS DOUBLE) THEN 'zh' ELSE lang0 END AS lang_pred,
       |  CASE WHEN zh_conf > CAST(0.15 AS DOUBLE) THEN zh_conf
       |       ELSE least(best_s * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) END AS confidence
       |FROM b""".stripMargin

  // -------------------------------------------------------------- LSH

  /** ±1 plane table (t, j, s[64]) from the squared-LCG parity —
    * mirrors Dedup.planeSign for dim=64, bits=6. */
  private def planesCte(tables: Int): String =
    s"""planes AS (
       |  SELECT r1.range AS t, r2.range AS j,
       |    list_transform(range(0, 64), dd ->
       |      CASE WHEN ((1103515245 * ((r1.range * 6 + r2.range) * 64 + dd) + 12345) % $P)
       |              * ((1103515245 * ((r1.range * 6 + r2.range) * 64 + dd) + 12345) % $P)
       |              % $P % 2 = 0
       |           THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS s
       |  FROM range(0, $tables) r1, range(0, 6) r2)""".stripMargin

  /** Left-to-right dot product of two 64-element double lists —
    * matches VectorDot's accumulation order. */
  private def dot64(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, 65), d -> $a[d] * $b[d])), (x, y) -> x + y)""".stripMargin

  /** SRP bucket keys per (vec, table) over a vector CTE `vecs(id, v)`. */
  private val keysCte =
    s"""bits AS (
       |  SELECT vecs.id, p.t, p.j,
       |    CASE WHEN ${dot64("vecs.v", "p.s")} > 0
       |         THEN (CAST(1 AS BIGINT) << p.j) ELSE CAST(0 AS BIGINT) END AS bit
       |  FROM vecs, planes p),
       |keys AS (SELECT id, t, CAST(sum(bit) AS BIGINT) AS key FROM bits GROUP BY id, t)""".stripMargin

  val embedPairsLsh: String =
    s"""WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS rv FROM embeddings),
       |nrm AS (SELECT vec_id, rv, sqrt(${dot64("rv", "rv")}) AS nn FROM raw),
       |vecs AS (SELECT vec_id AS id, list_transform(rv, x -> x / nn) AS v FROM nrm),
       |${planesCte(8)},
       |$keysCte,
       |bd AS (SELECT id AS doc_id, key + t * 4294967296 AS bk FROM keys),
       |${candCte(2000)}
       |SELECT c.a, c.b, ${dot64("va.v", "vb.v")} AS cos
       |FROM cand c JOIN vecs va ON va.id = c.a JOIN vecs vb ON vb.id = c.b
       |WHERE ${dot64("va.v", "vb.v")} > CAST(0.4 AS DOUBLE)""".stripMargin

  val annLshTopk: String =
    s"""WITH vecs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${planesCte(6)},
       |$keysCte,
       |qk AS (SELECT t, key FROM keys WHERE id = 7),
       |cand AS (
       |  SELECT DISTINCT k.id FROM keys k JOIN qk ON k.t = qk.t
       |  WHERE k.key = qk.key OR k.key = xor(qk.key, 1) OR k.key = xor(qk.key, 2)
       |     OR k.key = xor(qk.key, 4) OR k.key = xor(qk.key, 8)
       |     OR k.key = xor(qk.key, 16) OR k.key = xor(qk.key, 32)),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dot64("v", "v")})) AS q
       |       FROM vecs WHERE id = 7),
       |scored AS (
       |  SELECT c.id AS vec_id,
       |    ${dot64("vecs.v", "qn.q")} / sqrt(${dot64("vecs.v", "vecs.v")}) AS cos
       |  FROM cand c JOIN vecs ON vecs.id = c.id, qn)
       |SELECT vec_id, cos FROM (
       |  SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin

  /** 64-element zero vector (fold seed for order-controlled list sums). */
  private val zeros64 = "list_transform(range(0, 64), zz -> CAST(0.0 AS DOUBLE))"

  /** Left-to-right squared distance of two 64-element double lists —
    * matches the Scala kmeans loop `t = p(i) - c(i); d += t*t`. */
  private def sq64(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, 65), d -> ($a[d] - $b[d]) * ($a[d] - $b[d]))),
       |  (x, y) -> x + y)""".stripMargin

  /** One Lloyd iteration `prev -> cur` over the CTE `samp(id, v)`:
    * assign each sample point to its nearest centroid (strict-less
    * first-index tie-break = ORDER BY d, cid), then re-average each
    * non-empty cluster IN SAMPLE ORDER (`list(v ORDER BY id)` + left
    * fold) so the element sums accumulate exactly like the Scala
    * `sums(best)(i) += p(i)` loop; empty clusters keep their centroid. */
  private def lloydIter(prev: String, cur: String): String =
    s"""a$cur AS (
       |  SELECT id, v, cid FROM (
       |    SELECT s.id, s.v, c.cid,
       |      row_number() OVER (PARTITION BY s.id
       |        ORDER BY ${sq64("s.v", "c.cent")}, c.cid) AS rn
       |    FROM samp s, $prev c) t WHERE rn = 1),
       |$cur AS (
       |  SELECT p.cid,
       |    CASE WHEN g.cnt IS NULL THEN p.cent
       |         ELSE list_transform(range(1, 65), i -> g.total[i] / g.cnt) END AS cent
       |  FROM $prev p LEFT JOIN (
       |    SELECT cid, CAST(count(*) AS DOUBLE) AS cnt,
       |      list_reduce(list_prepend($zeros64, list(v ORDER BY id)),
       |        (acc, pt) -> list_transform(range(1, 65), i -> acc[i] + pt[i])) AS total
       |    FROM a$cur GROUP BY cid) g ON g.cid = p.cid)""".stripMargin

  /**
   * Full SQL replication of Similarity.ivfTopK (nlist=16, nprobe=6,
   * k=20, sample=512, iters=5): the quantizer is DETERMINISTIC — init
   * centroids are the first 16 of the 512 lowest-id vectors and every
   * float op replays in the same order — so 5 unrolled Lloyd
   * iterations reproduce the centroids bit-for-bit, the assignment
   * replicates NearestCentroid's argmin (c·c − 2 v·c) with first-index
   * tie-break, and the probe list is the query's 6 nearest centroids
   * by full squared distance (stable sort = ORDER BY d, cid).
   */
  val annIvfTopk: String = {
    val iters = (0 until 5).map(t => lloydIter(s"c$t", s"c${t + 1}")).mkString(",\n")
    s"""WITH vecs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |samp AS (SELECT id, v FROM vecs ORDER BY id LIMIT 512),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) AS BIGINT) AS cid, v AS cent
       |       FROM (SELECT id, v FROM samp ORDER BY id LIMIT 16) init),
       |$iters,
       |cfin AS (SELECT cid, cent,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(1, 65), i -> cent[i] * cent[i])), (x, y) -> x + y) AS cc
       |  FROM c5),
       |asg AS (SELECT id, v, cid FROM (
       |  SELECT vecs.id, vecs.v, c.cid,
       |    row_number() OVER (PARTITION BY vecs.id
       |      ORDER BY c.cc - 2.0 * ${dot64("vecs.v", "c.cent")}, c.cid) AS rn
       |  FROM vecs, cfin c) t WHERE rn = 1),
       |q AS (SELECT v AS qv FROM vecs WHERE id = 7),
       |probe AS (SELECT cid FROM (
       |  SELECT c.cid, ${sq64("c.cent", "q.qv")} AS d FROM c5 c, q) t
       |  ORDER BY d, cid LIMIT 6),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dot64("v", "v")})) AS q
       |       FROM vecs WHERE id = 7),
       |scored AS (
       |  SELECT a.id AS vec_id,
       |    ${dot64("a.v", "qn.q")} / sqrt(${dot64("a.v", "a.v")}) AS cos
       |  FROM asg a JOIN probe p ON a.cid = p.cid, qn)
       |SELECT vec_id, cos FROM (
       |  SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin
  }

  /** Exact top-k by cosine (= IVF with nprobe = nlist): scoring folds
    * replicate VectorDot's order; ORDER BY the UNROUNDED cosine. */
  /** The durable-vector-index lane's full probe over the MUTATED
    * catalog table = exact brute-force cosine top-k over (corpus minus
    * the deleted keys, plus the re-inserted +100000 twins). */
  val annCatalogTopk: String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id % 97 <> 3),
       |ins AS (
       |  SELECT vec_id + 100000 AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 8),
       |vecs AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dot64("v", "v")})) AS q
       |       FROM (SELECT CAST(embedding AS DOUBLE[]) AS v
       |             FROM embeddings WHERE vec_id = 7)),
       |scored AS (
       |  SELECT vecs.id AS vec_id,
       |    ${dot64("vecs.v", "qn.q")} / sqrt(${dot64("vecs.v", "vecs.v")}) AS cos
       |  FROM vecs, qn)
       |SELECT vec_id, cos FROM (
       |  SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin

  /** graft_index_stats' oracle-stable identity columns on a fresh
    * (un-churned) index: live entries = the corpus's non-null vector
    * count; name/kind/column/nlist come from the CREATE statement. */
  val annIndexStats: String =
    """SELECT 'emb' AS name, 'ivf' AS kind, 'embedding' AS vector_column,
      |  CAST(16 AS INTEGER) AS nlist,
      |  (SELECT count(*) FROM embeddings WHERE embedding IS NOT NULL)
      |    AS live_entries""".stripMargin

  val annIvfFull: String =
    s"""WITH vecs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |qn AS (SELECT list_transform(v, x -> x / sqrt(${dot64("v", "v")})) AS q
       |       FROM vecs WHERE id = 7),
       |scored AS (
       |  SELECT vecs.id AS vec_id,
       |    ${dot64("vecs.v", "qn.q")} / sqrt(${dot64("vecs.v", "vecs.v")}) AS cos
       |  FROM vecs, qn)
       |SELECT vec_id, cos FROM (
       |  SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id LIMIT 20) top""".stripMargin

  // -------------------------------------------------------- multimodal

  /** 48271^j mod 2^31-1 for j = 1..130 as a 1-based SQL list literal:
    * the closed form of the stub codec's MINSTD pixel stream
    * (state_i = seed · 48271^i), covering the max frame size
    * (15 × 8 = 120 pixels). */
  private val powLit: String = {
    val ps = Iterator.iterate(1L)(p => p * graft.pipeline.Multimodal.PixA % 2147483647L)
      .drop(1).take(130).toSeq
    ps.mkString("[", ",", "]")
  }

  /** Left-to-right dot product of two 8-element double lists. */
  private def dot8(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, 9), d -> $a[d] * $b[d])), (x, y) -> x + y)""".stripMargin

  /** Media metadata + 8-band mean-pooled features, replicating
    * Multimodal.syntheticMediaTable + extractFeatures: pixel(i) of
    * frame fr is ((seed·48271^(i+1) mod P) >> 8) & 255 with
    * seed = ((id mod P)·48271 + fr·16807 + 12345) mod P; band b pools
    * row b (h=8, dim=8), and per-frame means accumulate in frame
    * order (matching the Scala loop's double additions). */
  /** The feat CTE alone (band-mean features from closed-form pixels) —
    * composed under different `m` tables by the synthetic and
    * real-PNG feature oracles. */
  private val mediaFeatBody: String =
    s"""feat AS (SELECT id, kind,
       |  list_transform(range(0, 8), band ->
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(0, frames), fr ->
       |        CAST(list_sum(list_transform(range(0, w), c ->
       |          ((((((id % $P) * ${graft.pipeline.Multimodal.PixA}
       |               + fr * ${graft.pipeline.Multimodal.PixSeedF}
       |               + ${graft.pipeline.Multimodal.PixSeedC}) % $P)
       |            * ($powLit)[band * w + c + 1]) % $P) >> 8) & 255)) AS DOUBLE)
       |          / w / frames)),
       |      (a, x) -> a + x)) AS f
       |  FROM m)""".stripMargin

  private val mediaFeatCte: String =
    s"""m AS (SELECT doc_id AS id,
       |        CAST(8 + (n_chars % 8) AS BIGINT) AS w,
       |        CAST(CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 1 END AS BIGINT) AS frames,
       |        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |             ELSE 'video' END AS kind
       |      FROM documents),
       |$mediaFeatBody""".stripMargin

  /** Media dedup: every pixel regenerated (seed_f · 48271^(i+1) mod P,
    * byte = (state >> 8) & 255), folded frame-major with (a·31 + x)
    * mod P — exactly Multimodal.contentFingerprints; planted copies
    * (id + 1e6, same content) collapse, keeper = original id. */
  val mmDedup: String =
    s"""WITH m AS (SELECT doc_id AS id,
       |        CAST(8 + (n_chars % 8) AS BIGINT) AS w,
       |        CAST(CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 1 END AS BIGINT) AS frames
       |      FROM documents),
       |fp AS (SELECT id,
       |  list_reduce(list_prepend(CAST(17 AS BIGINT),
       |    flatten(list_transform(range(0, frames), fr ->
       |      list_transform(range(0, w * 8), i ->
       |        ((((((id % $P) * ${graft.pipeline.Multimodal.PixA}
       |             + fr * ${graft.pipeline.Multimodal.PixSeedF}
       |             + ${graft.pipeline.Multimodal.PixSeedC}) % $P)
       |          * ($powLit)[i + 1]) % $P) >> 8) & 255)))),
       |    (a, x) -> (a * 31 + x) % $P) AS fp
       |  FROM m)
       |SELECT CAST(min(id) AS BIGINT) AS keep_media_id,
       |  CAST(2 * count(*) AS BIGINT) AS n_copies, fp
       |FROM fp GROUP BY fp""".stripMargin

  val mmFeatures: String =
    s"""WITH $mediaFeatCte
       |SELECT id AS media_id, kind,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), f), (a, x) -> a + x) AS feat_sum
       |FROM feat""".stripMargin

  /** mm_features_real: every payload is a REAL grayscale PNG whose
    * pixels are the closed-form MINSTD frame-0 stream — so the feature
    * oracle is [[mmFeatures]] with frames pinned to 1 and every doc an
    * image. A real-decode deviation of even one pixel breaks the
    * hash. */
  val mmFeaturesReal: String =
    s"""WITH m AS (SELECT doc_id AS id,
       |        CAST(8 + (n_chars % 8) AS BIGINT) AS w,
       |        CAST(1 AS BIGINT) AS frames,
       |        'image' AS kind
       |      FROM documents),
       |$mediaFeatBody
       |SELECT id AS media_id, kind,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), f), (a, x) -> a + x) AS feat_sum
       |FROM feat""".stripMargin

  /** text_sqlfn: the SQL-scalar-function surface — every function is
    * the SAME kernel its Scala-API lane already oracles, so this
    * composes those proven CTEs (quality, langid, subwords, token
    * count, fingerprint, simhash, redaction length) over `documents`
    * and joins on doc_id. */
  val textSqlfn: String = {
    import graft.functions.TextFunctions.{EmailRe, PhoneRe, UrlRe}
    s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS toks FROM documents),
       |tp AS (SELECT doc_id, list_transform(toks, t -> ${poly("t")}) AS tp FROM tok),
       |th2 AS (SELECT doc_id, list_transform(tp, p ->
       |  ((p * ${Dedup.SimLaneA1} + ${Dedup.SimLaneB1}) % $P)
       |    * ((p * ${Dedup.SimLaneA1} + ${Dedup.SimLaneB1}) % $P) % $P * 2147483648
       |  + ((p * ${Dedup.SimLaneA2} + ${Dedup.SimLaneB2}) % $P)
       |    * ((p * ${Dedup.SimLaneA2} + ${Dedup.SimLaneB2}) % $P) % $P) AS th FROM tp),
       |shq AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(0, 62), b ->
       |    CASE WHEN 2 * len(list_filter(th, h -> ((h >> b) & 1) = 1)) > len(th)
       |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
       |  (a, x) -> a | x) AS sh FROM th2),
       |fpq AS (SELECT doc_id, $fpExpr AS fp
       |        FROM (SELECT doc_id, tp AS th FROM tp) _f),
       |q AS ($textQualityScore),
       |l AS ($textLangid),
       |sw AS ($textSubwords),
       |tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok),
       |r AS (SELECT doc_id, CAST(length(
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
       |  FROM documents)
       |SELECT tk.doc_id, tk.n_tokens, sw.n_subwords, l.lang_pred,
       |  l.confidence, q.quality, fpq.fp, shq.sh, r.redacted_len
       |FROM tk JOIN sw USING (doc_id) JOIN l USING (doc_id)
       |  JOIN q USING (doc_id) JOIN fpq USING (doc_id)
       |  JOIN shq USING (doc_id) JOIN r USING (doc_id)""".stripMargin
  }

  /** mm_video_real: every payload is a REAL uncompressed RIFF/AVI clip
    * (4 BI_RGB DIB frames) whose gray pixels are the closed-form MINSTD
    * stream — so the feature oracle is [[mmFeatures]] with frames
    * pinned to 4 and every doc a video. A one-pixel decode deviation in
    * any frame breaks the hash. */
  val mmVideoReal: String =
    s"""WITH m AS (SELECT doc_id AS id,
       |        CAST(8 + (n_chars % 8) AS BIGINT) AS w,
       |        CAST(4 AS BIGINT) AS frames,
       |        'video' AS kind
       |      FROM documents),
       |$mediaFeatBody
       |SELECT id AS media_id, kind,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), f), (a, x) -> a + x) AS feat_sum
       |FROM feat""".stripMargin

  /** mm_audio_real: every payload is a REAL RIFF/WAVE 16-bit PCM clip
    * whose signed samples are the closed-form MINSTD stream
    * s_i = ((((seed · 48271^(i+1)) mod P) >> 8) & 0xffff) - 32768 with
    * seed = ((id mod P) · 48271 + 69069) mod P; band b of 8 pools
    * samples [b·n/8, (b+1)·n/8) (n = 64 + 8·(id mod 8), so bands are
    * equal-size), and feat_wsum weights band means by (band+1) to keep
    * the check sensitive to pooling. A one-sample decode deviation
    * breaks the hash. */
  val mmAudioReal: String =
    s"""WITH m AS (SELECT doc_id AS id,
       |        CAST(64 + 8 * (doc_id % 8) AS BIGINT) AS n FROM documents),
       |feat AS (SELECT id,
       |  list_transform(range(0, 8), band ->
       |    CAST(list_sum(list_transform(range(band * (n // 8), (band + 1) * (n // 8)), i ->
       |      ((((((id % $P) * ${graft.pipeline.Multimodal.PixA}
       |           + ${graft.pipeline.Multimodal.AudSeedC}) % $P)
       |        * ($powLit)[i + 1]) % $P >> 8) & 65535) - 32768))
       |      AS DOUBLE) / (n // 8)) AS f
       |  FROM m)
       |SELECT id AS media_id, 'audio' AS kind,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), f), (a, x) -> a + x) AS feat_sum,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(0, 8), b -> f[b + 1] * (b + 1))),
       |    (a, x) -> a + x) AS feat_wsum
       |FROM feat""".stripMargin

  val mmAnn: String =
    s"""WITH $mediaFeatCte,
       |qn AS (SELECT list_transform(f, x -> x / sqrt(${dot8("f", "f")})) AS q
       |       FROM feat WHERE id = 0),
       |scored AS (
       |  SELECT feat.id AS media_id,
       |    ${dot8("feat.f", "qn.q")} / sqrt(${dot8("feat.f", "feat.f")}) AS cos
       |  FROM feat, qn)
       |SELECT media_id, cos FROM (
       |  SELECT media_id, cos FROM scored ORDER BY cos DESC, media_id LIMIT 10) top""".stripMargin

  /** mm_resize_frames metadata path: videos are doc_id % 3 = 2 with 4
    * frames; stride-2 sampling keeps frames 0 and 2; after factor-2
    * resize a frame is ((8 + n_chars % 8) / 2) * (8 / 2) bytes. */
  val mmResizeFrames: String =
    """SELECT doc_id AS media_id, CAST(f.fi AS INTEGER) AS frame_idx,
      |  CAST(((8 + (n_chars % 8)) // 2) * 4 AS BIGINT) AS frame_bytes
      |FROM documents, (VALUES (0), (2)) f(fi)
      |WHERE doc_id % 3 = 2""".stripMargin

  /** All oracle entries contributed by this object. */
  val sql: Map[String, String] = Map(
    "dedup_minhash" -> dedupMinhash,
    "dedup_incremental" -> dedupIncremental,
    "dedup_ngram" -> dedupNgram,
    "dedup_spans" -> dedupSpans,
    "dedup_spans_incremental" -> dedupSpansIncremental,
    "dedup_spans_bloom" -> dedupSpansBloom,
    "dedup_clusters" -> dedupClusters,
    "text_redact" -> textRedact,
    "text_chunks" -> textChunks,
    "text_vocab" -> textVocab,
    "text_repetition" -> textRepetition,
    "curation_decontaminate_ngram" -> curationDecontaminateNgram,
    "curation_token_budget" -> curationTokenBudget,
    "curation_mixture" -> curationMixture,
    "curation_quality_filter" -> curationQualityFilter,
    "curation_order" -> curationOrder,
    "curation_splits" -> curationSplits,
    "curation_pack" -> curationPack,
    "curation_contamination" -> curationContamination,
    "curation_sample" -> curationSample,
    "curation_sample_stratified" -> curationSampleStratified,
    "dedup_containment" -> dedupContainment,
    "dedup_keeper_quality" -> dedupKeeperQuality,
    "sketch_heavy_hitters" -> sketchHeavyHitters,
    "sketch_distinct_kmv" -> sketchDistinctKmv,
    "sketch_distinct_hll" -> sketchDistinctHll,
    "sketch_bloom_prune" -> sketchBloomPrune,
    "sketch_quantiles" -> sketchQuantiles,
    "text_rarity" -> textRarity,
    "pipeline_corpus_build" -> pipelineCorpusBuild,
    "dedup_simhash" -> dedupSimhash,
    "text_fingerprint" -> textFingerprint,
    "text_subwords" -> textSubwords,
    "text_quality_score" -> textQualityScore,
    "text_langid" -> textLangid,
    "embed_pairs_lsh" -> embedPairsLsh,
    "dedup_semantic" -> dedupSemantic,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_full" -> annIvfFull,
    "ann_ivf_topk" -> annIvfTopk,
    // the saved-index search replays the identical quantizer + probe,
    // so its oracle IS the in-memory IVF oracle; the appended build
    // trains on the same first-512-ids sample, so it shares it too
    "ann_ivf_saved" -> annIvfTopk,
    "ann_ivf_appended" -> annIvfTopk,
    "ann_batch_topk" -> annBatchTopk,
    "ann_catalog_topk" -> annCatalogTopk,
    "ann_catalog_batch_topk" -> annCatalogBatchTopk,
    "ann_catalog_optimized_topk" -> annCatalogTopk,
    "ann_catalog_filtered_topk" -> annCatalogFilteredTopk,
    "ann_catalog_batch_filtered_topk" -> annCatalogBatchFilteredTopk,
    "ann_catalog_pq_topk" -> annCatalogPqTopk,
    "ann_catalog_batch_pq_topk" -> annCatalogBatchPqTopk,
    // REINDEX retrains centroids but the lane probes nprobe = nlist,
    // which is EXACT over the live content for any centroids — the
    // plain catalog-probe oracle is the right truth
    "ann_catalog_reindexed_topk" -> annCatalogTopk,
    // the historical probe serves the PRE-DML snapshot exactly, so its
    // truth is brute force over the ORIGINAL (un-mutated) corpus
    "ann_catalog_at_topk" -> annIvfFull,
    "ann_index_stats" -> annIndexStats,
    "ann_pq_topk" -> annPqTopk,
    "ann_ivfpq_topk" -> annIvfPqTopk,
    "mm_resize_frames" -> mmResizeFrames,
    "mm_dedup" -> mmDedup,
    "mm_features" -> mmFeatures,
    "mm_features_real" -> mmFeaturesReal,
    "mm_audio_real" -> mmAudioReal,
    "mm_video_real" -> mmVideoReal,
    "text_sqlfn" -> textSqlfn,
    "mm_ann" -> mmAnn,
  )
}
