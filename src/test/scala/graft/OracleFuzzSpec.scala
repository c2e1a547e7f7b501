package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextOps

/** Seed-fuzz oracle parity (VERDICT r10 next-round item 5): the committed
  * replay oracles (q118, q120-q124) pin ONE seed / modulus / window / rate
  * choice each, so a latent engine divergence that happens to cancel at
  * the committed constant (a regex class, a locale-sensitive collation, a
  * hash edge case, an off-by-one that only bites at other widths) could
  * hide behind it. This spec re-derives RANDOM variants of each operator
  * and pushes them through `tools/check_oracle.py`'s replica path — the
  * same pyarrow-vs-DuckDB comparator the driver's gate uses — so parity
  * is proven across the parameter space, not at one point.
  *
  * Parameters are drawn fresh every run (and printed for reproduction):
  * these oracles must agree for ALL parameters, so any failure is a real
  * engine divergence, never flake. Runs at sf0.001; the replay SQL is
  * sf-independent. Skips (cancels) if python3/duckdb/pyarrow are absent —
  * the comparator is the driver-side toolchain, not a library dependency
  * of the engine.
  */
class OracleFuzzSpec extends SparkSpec {

  private def pythonOk: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb, pyarrow")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  // Verify.scala's JSON string escape, inlined: control chars in the
  // builder-authored SQL would break check_oracle.py's json.load
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private val scoreSql =
    """0.4::DOUBLE * (len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks))
      |      + 0.3::DOUBLE * least(1.0::DOUBLE, len(toks) / 100.0::DOUBLE)
      |      + 0.3::DOUBLE * (1.0::DOUBLE - length(regexp_replace(lt, '[a-z0-9\s]', '', 'g')) / length(lt))""".stripMargin

  test("replay oracles hold under randomized seeds/moduli/windows/rates") {
    assume(pythonOk, "python3 + duckdb + pyarrow unavailable")
    val masterSeed = System.nanoTime()
    val rnd = new scala.util.Random(masterSeed)
    info(s"fuzz master seed: $masterSeed")
    val out = Files.createTempDirectory("graft_oracle_fuzz").toString
    val oracles = scala.collection.mutable.LinkedHashMap[String, String]()
    def dump(name: String, df: DataFrame, sql: String): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      oracles(name) = sql
    }
    val docs = graft.sources.Sources.table(spark, sf, "documents")
    val enStop = TextOps.langStopwords.head._2

    for (v <- 0 until 3) {
      // --- q118 shape: deterministicShuffle under a random seed/shards
      val seed = "fz" + rnd.alphanumeric.take(8).mkString
      val shards = 2 + rnd.nextInt(15)
      val hexChars = 1 + rnd.nextInt(3)
      info(s"v$v shuffle: seed=$seed shards=$shards bucketHexChars=$hexChars")
      dump(s"fz_shuffle_$v",
        graft.operators.Packing.deterministicShuffle(
          docs.select("doc_id"), "doc_id", seed, shards, hexChars)
          .orderBy("doc_id"),
        s"""WITH r AS (
           |  SELECT doc_id,
           |    row_number() OVER (
           |      ORDER BY md5('$seed:' || doc_id::VARCHAR), doc_id)
           |      - 1 AS shuffle_rank
           |  FROM documents)
           |SELECT doc_id, shuffle_rank, shuffle_rank % $shards AS shard_id
           |FROM r ORDER BY doc_id""".stripMargin)

      // --- q120 shape: selectWithinBudget at a random budget fraction
      val den = 2 + rnd.nextInt(4)
      val buckets = Seq(1, 16, 64, 128)(rnd.nextInt(4))
      info(s"v$v budget: denominator=$den buckets=$buckets")
      val scored = docs.select(col("doc_id"),
        TextOps.qualityScore(col("text"), enStop).as("quality_score"),
        TextOps.tokenCountWs(col("text")).cast("long").as("n_tokens"))
        .where(col("quality_score").isNotNull)
      val budget = scored.agg(sum("n_tokens")).head().getLong(0) / den
      dump(s"fz_budget_$v",
        graft.operators.Downsample.selectWithinBudget(
          scored, "doc_id", "quality_score", "n_tokens", budget, buckets)
          .select("doc_id", "quality_score", "n_tokens", "sel_rank", "cum_cost")
          .orderBy("sel_rank"),
        s"""WITH d AS (
           |  SELECT doc_id, lower(text) AS lt,
           |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents WHERE length(text) > 0),
           |scored AS (
           |  SELECT doc_id, $scoreSql AS quality_score,
           |    CAST(len(toks) AS BIGINT) AS n_tokens
           |  FROM d),
           |ranked AS (
           |  SELECT doc_id, quality_score, n_tokens,
           |    CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS sel_rank,
           |    CAST(SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
           |  FROM scored),
           |b AS (SELECT CAST(SUM(n_tokens) // $den AS BIGINT) AS budget FROM scored)
           |SELECT doc_id, quality_score, n_tokens, sel_rank, cum_cost
           |FROM ranked, b WHERE cum_cost <= budget
           |ORDER BY sel_rank""".stripMargin)

      // --- q121 shape: removeDuplicateSpans at a random window width
      val w = 3 + rnd.nextInt(8)
      info(s"v$v spans: window=$w")
      dump(s"fz_spans_$v",
        Dedup.removeDuplicateSpans(docs, "doc_id", "text", w)
          .where(col("n_removed") > 0).orderBy("doc_id"),
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |w0 AS (
           |  SELECT doc_id, i AS pos,
           |         md5(array_to_string(d.toks[i:i+${w - 1}], ' ')) AS h
           |  FROM d CROSS JOIN unnest(range(1, len(d.toks)-${w - 2})) u(i)
           |  WHERE len(d.toks) >= $w),
           |w AS (
           |  SELECT doc_id, pos,
           |         ('0x'||substr(h,1,14))::BIGINT AS ha,
           |         ('0x'||substr(h,17,14))::BIGINT AS hb
           |  FROM w0),
           |dup AS (SELECT ha, hb, min(doc_id) AS canon FROM w
           |        GROUP BY ha, hb HAVING min(doc_id) <> max(doc_id)),
           |m AS (
           |  SELECT w.doc_id, w.pos, (w.doc_id = dup.canon) AS iscanon,
           |         row_number() OVER (
           |           PARTITION BY w.doc_id, (w.doc_id = dup.canon)
           |           ORDER BY w.pos) AS rn
           |  FROM w JOIN dup USING (ha, hb)),
           |spans AS (
           |  SELECT doc_id, iscanon, min(pos) AS s, max(pos) + ${w - 1} AS e
           |  FROM m GROUP BY doc_id, iscanon, pos - rn),
           |spl AS (SELECT doc_id,
           |          list({'s': s, 'e': e}) FILTER (WHERE NOT iscanon) AS rm,
           |          list({'s': s, 'e': e}) FILTER (WHERE iscanon) AS keep
           |        FROM spans GROUP BY doc_id),
           |kept AS (
           |  SELECT d.doc_id, len(d.toks) AS n0,
           |    list_transform(
           |      list_filter(
           |        list_transform(d.toks, (t, i) -> {'p': i, 'tk': t}),
           |        x -> len(list_filter(
           |               coalesce(spl.rm, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
           |               sp -> x.p >= sp.s AND x.p <= sp.e)) = 0
           |          OR len(list_filter(
           |               coalesce(spl.keep, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])),
           |               sp -> x.p >= sp.s AND x.p <= sp.e)) > 0),
           |      x -> x.tk) AS ktoks
           |  FROM d LEFT JOIN spl USING (doc_id))
           |SELECT doc_id,
           |       coalesce(array_to_string(ktoks, ' '), '') AS text_clean,
           |       CAST(n0 AS BIGINT) AS n_tokens,
           |       CAST(n0 - len(ktoks) AS BIGINT) AS n_removed
           |FROM kept WHERE n0 - len(ktoks) > 0 ORDER BY doc_id""".stripMargin)

      // --- q122 shape: topFractionPerKey at a random rate
      val bp = 1 + rnd.nextInt(9999)
      info(s"v$v frac: fracBp=$bp")
      dump(s"fz_frac_$v",
        graft.operators.Downsample.topFractionPerKey(
          docs.select(col("doc_id"), col("source"),
            TextOps.qualityScore(col("text"), enStop).as("quality_score"))
            .where(col("quality_score").isNotNull),
          "source", "doc_id", "quality_score", bp)
          .select("source", "doc_id", "quality_score", "quality_rank")
          .orderBy("source", "doc_id"),
        s"""WITH d AS (
           |  SELECT doc_id, source, lower(text) AS lt,
           |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents WHERE length(text) > 0),
           |scored AS (
           |  SELECT doc_id, source, $scoreSql AS quality_score
           |  FROM d),
           |ranked AS (
           |  SELECT source, doc_id, quality_score,
           |    CAST(row_number() OVER (PARTITION BY source
           |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS quality_rank,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM scored)
           |SELECT source, doc_id, quality_score, quality_rank
           |FROM ranked WHERE quality_rank <= (n * $bp + 9999) // 10000
           |ORDER BY source, doc_id""".stripMargin)

      // --- q123 shape: snapshotDiff under random moduli and change text
      val Seq(ma, mb, mc) =
        rnd.shuffle(Seq(5, 7, 11, 13, 17, 19, 23)).take(3)
      val (ra, rb, rc) = (rnd.nextInt(ma), rnd.nextInt(mb), rnd.nextInt(mc))
      val sfx = " " + rnd.alphanumeric.take(4).mkString
      info(s"v$v diff: old%$ma!=$ra new%$mb!=$rb changed%$mc==$rc sfx='$sfx'")
      val oldSnap = docs.where(col("doc_id") % ma =!= ra)
      val newSnap = docs.where(col("doc_id") % mb =!= rb)
        .withColumn("text", when(col("doc_id") % mc === rc,
          concat(col("text"), lit(sfx))).otherwise(col("text")))
      dump(s"fz_diff_$v",
        graft.delta.Incremental.snapshotDiff(
          oldSnap, newSnap, "doc_id", "text").orderBy("doc_id"),
        s"""WITH o AS (
           |  SELECT doc_id, md5(text) AS h FROM documents
           |  WHERE doc_id % $ma <> $ra),
           |n AS (
           |  SELECT doc_id,
           |         md5(CASE WHEN doc_id % $mc = $rc THEN text || '$sfx'
           |                  ELSE text END) AS h
           |  FROM documents WHERE doc_id % $mb <> $rb)
           |SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
           |       CASE WHEN o.doc_id IS NULL THEN 'added'
           |            WHEN n.doc_id IS NULL THEN 'removed'
           |            WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
           |            ELSE 'changed' END AS status
           |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
           |ORDER BY doc_id""".stripMargin)

      // --- q124 shape: decontaminate under random n/minOverlap/eval split
      val n = 2 + rnd.nextInt(3)
      val minOv = 2 + rnd.nextInt(7)
      val em = 5 + rnd.nextInt(8)
      info(s"v$v decon: n=$n minOverlap=$minOv evalMod=$em")
      dump(s"fz_decon_$v",
        Dedup.decontaminate(
          docs.where(col("doc_id") % em =!= 0),
          docs.where(col("doc_id") % em === 0),
          "doc_id", "text", n, minOv)
          .select("doc_id", "source").orderBy("doc_id"),
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |sh AS (
           |  SELECT DISTINCT doc_id, u.s AS shingle
           |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-${n - 2}),
           |       i -> array_to_string(d.toks[i:i+${n - 1}], ' '))) u(s)
           |  WHERE len(d.toks) >= $n),
           |tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % $em <> 0),
           |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % $em = 0),
           |bad AS (
           |  SELECT DISTINCT train_id
           |  FROM (SELECT train_id, eval_id, count(*) AS n_overlap
           |        FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
           |  WHERE n_overlap >= $minOv)
           |SELECT doc_id, source FROM documents
           |WHERE doc_id % $em <> 0
           |  AND doc_id NOT IN (SELECT train_id FROM bad)
           |ORDER BY doc_id""".stripMargin)
    }

    // --- sampling family: cap / mix / importance under random params
    for (v <- 0 until 2) {
      // q76 shape: capPerKey at a random k (the window group-limit path)
      val k = 1 + rnd.nextInt(30)
      info(s"v$v cap: k=$k")
      dump(s"fz_cap_$v",
        graft.operators.Downsample.capPerKey(
          docs.select("doc_id", "source"), "source", "doc_id", k)
          .orderBy("source", "sample_rank"),
        s"""WITH h AS (
           |  SELECT doc_id, source,
           |    ('0x'||substr(md5('cap#' || doc_id::VARCHAR),1,15))::BIGINT AS hv
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, source,
           |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
           |         AS INT) AS sample_rank
           |  FROM h)
           |SELECT doc_id, source, sample_rank FROM r
           |WHERE sample_rank <= $k ORDER BY source, sample_rank""".stripMargin)

      // q99 shape: mixByWeight at random basis-point rates
      val rates = (0 to 4).map(i => s"src$i" -> rnd.nextInt(10001)).toMap
      info(s"v$v mix: rates=$rates")
      dump(s"fz_mix_$v",
        graft.operators.Downsample.mixByWeight(
          docs.select("doc_id", "source"), "source", "doc_id", rates)
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
          .orderBy("source"),
        s"""WITH b AS (
           |  SELECT doc_id, source,
           |    ('0x'||substr(md5('mix#' || doc_id::VARCHAR),1,15))::BIGINT % 10000 AS bucket
           |  FROM documents),
           |rates(source, bp) AS (VALUES
           |  ${rates.toSeq.sorted.map { case (s0, r) => s"('$s0', $r)" }
                .mkString(", ")})
           |SELECT b.source, count(*) AS n_kept
           |FROM b JOIN rates r ON b.source = r.source
           |WHERE b.bucket < r.bp
           |GROUP BY b.source ORDER BY b.source""".stripMargin)

      // q108 shape: importanceSample at a random maxBps over a simple
      // deterministic integer weight (doc_id-derived, engine-portable)
      val maxBps = 500 + rnd.nextInt(9501)
      info(s"v$v importance: maxBps=$maxBps")
      val weighted = docs.select(col("doc_id"),
        (col("doc_id") % 997 + 1).cast("long").as("w"))
      dump(s"fz_imp_$v",
        graft.operators.Downsample.importanceSample(
          weighted, "doc_id", "w", maxBps).orderBy("doc_id"),
        s"""WITH w AS (SELECT doc_id, doc_id % 997 + 1 AS w FROM documents),
           |mx AS (SELECT max(w) AS max_w FROM w),
           |smp AS (
           |  SELECT w.doc_id, w.w,
           |         (w.w * $maxBps) // m.max_w AS rate_bp,
           |         ('0x'||substr(md5('imp#' || w.doc_id::VARCHAR),1,15))::BIGINT
           |           % 10000 AS bucket
           |  FROM w CROSS JOIN mx m)
           |SELECT doc_id, w, rate_bp
           |FROM smp WHERE bucket < rate_bp ORDER BY doc_id""".stripMargin)
    }

    // --- q126 shape: sourceOverlapMatrix at random shingle widths
    for (v <- 0 until 2) {
      val n = 2 + rnd.nextInt(3)
      info(s"v$v overlap: n=$n")
      dump(s"fz_overlap_$v",
        Dedup.sourceOverlapMatrix(docs, "text", "source", n)
          .orderBy("stratum_a", "stratum_b"),
        s"""WITH d AS (
           |  SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |sh AS (
           |  SELECT DISTINCT source,
           |         ('0x'||substr(md5(u.s),1,15))::BIGINT AS k
           |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-${n - 2}),
           |       i -> array_to_string(d.toks[i:i+${n - 1}], ' '))) u(s)
           |  WHERE len(d.toks) >= $n),
           |sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
           |inter AS (
           |  SELECT a.source AS stratum_a, b.source AS stratum_b,
           |         count(*) AS inter
           |  FROM sh a JOIN sh b ON a.k = b.k AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT stratum_a, stratum_b, inter,
           |       inter / (sa.n_sh + sb.n_sh - inter) AS jaccard,
           |       inter / least(sa.n_sh, sb.n_sh) AS containment
           |FROM inter
           |JOIN sizes sa ON sa.source = stratum_a
           |JOIN sizes sb ON sb.source = stratum_b
           |ORDER BY stratum_a, stratum_b""".stripMargin)
    }

    // --- q152 shape: packSequences at random budget/shards (n_chars
    // stands in for the token count — same arithmetic, cheaper oracle)
    for (v <- 0 until 3) {
      val budget = 64L + rnd.nextInt(4096)
      val shards = 2 + rnd.nextInt(14)
      info(s"v$v pack: budget=$budget shards=$shards")
      dump(s"fz_pack_$v",
        graft.operators.Packing.packSequences(
          docs.select("doc_id", "n_chars"), "doc_id", "n_chars",
          budget, shards).orderBy("doc_id"),
        s"""WITH h AS (
           |  SELECT doc_id, n_chars,
           |    ('0x'||substr(md5('pack#' || doc_id::VARCHAR),1,15))::BIGINT AS hv
           |  FROM documents),
           |s AS (SELECT doc_id, n_chars, hv, hv % $shards AS shard FROM h),
           |r AS (SELECT doc_id, n_chars, shard,
           |  CAST(coalesce(SUM(n_chars) OVER (PARTITION BY shard
           |    ORDER BY hv, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS st
           |  FROM s)
           |SELECT doc_id, n_chars, shard,
           |  st // $budget AS seq_idx, st % $budget AS seq_offset,
           |  greatest(1, (st + n_chars - 1) // $budget - st // $budget + 1)
           |    AS n_spanned
           |FROM r ORDER BY doc_id""".stripMargin)
    }

    // --- q150 shape: BPE under RANDOM merge tables — distinct
    // single-char pairs over frequent letters plus one cascade built on
    // the first merge's output, so multi-level merges vary per run. The
    // DuckDB replay interpolates the same table into the recursive CTE.
    for (v <- 0 until 2) {
      val alpha = "etaoinshr"
      val base = rnd.shuffle(
        (for (a <- alpha; b <- alpha) yield (a.toString, b.toString))
          .toVector).take(7).toList
      val cascade = (base.head._1 + base.head._2,
        alpha(rnd.nextInt(alpha.length)).toString)
      val merges = base :+ cascade
      info(s"v$v bpe: merges=$merges")
      val valuesSql = merges.zipWithIndex
        .map { case ((l, r), i) => s"($i,'$l','$r')" }.mkString(",")
      val prepped = docs.select(col("doc_id"),
        lower(substring(
          regexp_replace(col("text"), "[^A-Za-z ]", ""), 1, 40))
          .as("bpe_text"))
      dump(s"fz_bpe_$v",
        graft.text.Bpe.bpeEncode(prepped, "bpe_text", merges)
          .select(col("doc_id"),
            size(col("bpe_tokens")).cast("long").as("n_tokens"),
            array_join(col("bpe_tokens"), "|").as("tokens_str"))
          .orderBy("doc_id"),
        s"""WITH RECURSIVE
           |prep AS (
           |  SELECT doc_id,
           |    lower(substr(regexp_replace(text, '[^A-Za-z ]', '', 'g'),
           |      1, 40)) AS t
           |  FROM documents),
           |merges(rank, l, r) AS (VALUES $valuesSql),
           |words AS (
           |  SELECT doc_id, CAST(i AS INT) AS word_idx,
           |    ws[CAST(i AS INT)] AS word
           |  FROM (SELECT doc_id,
           |          regexp_extract_all(t, ' ?[a-z]+| +') AS ws
           |        FROM prep)
           |  CROSS JOIN unnest(range(1, len(ws) + 1)) r(i)),
           |seed AS (
           |  SELECT doc_id, word_idx,
           |    list_aggregate(list_transform(string_split_regex(word, ''),
           |      c -> '<' || c || '>'), 'string_agg', '') AS seq, 0 AS it
           |  FROM words),
           |bpe AS (
           |  SELECT * FROM seed
           |  UNION ALL
           |  SELECT doc_id, word_idx,
           |    replace(seq, '<'||bl||'><'||br||'>', '<'||bl||br||'>')
           |      AS seq, it + 1
           |  FROM (
           |    SELECT b.doc_id, b.word_idx, b.seq, b.it,
           |      (SELECT arg_min(m.l, m.rank) FROM merges m
           |       WHERE contains(b.seq, '<'||m.l||'><'||m.r||'>')) AS bl,
           |      (SELECT arg_min(m.r, m.rank) FROM merges m
           |       WHERE contains(b.seq, '<'||m.l||'><'||m.r||'>')) AS br
           |    FROM bpe b WHERE b.it < 24) s
           |  WHERE bl IS NOT NULL),
           |final AS (
           |  SELECT doc_id, word_idx, seq FROM (
           |    SELECT *, row_number() OVER (PARTITION BY doc_id, word_idx
           |      ORDER BY it DESC) AS rn FROM bpe)
           |  WHERE rn = 1),
           |agg AS (
           |  SELECT doc_id,
           |    CAST(sum(len(regexp_extract_all(seq, '<([^<>]+)>', 1)))
           |      AS BIGINT) AS n_tokens,
           |    string_agg(array_to_string(regexp_extract_all(seq,
           |      '<([^<>]+)>', 1), '|'), '|' ORDER BY word_idx)
           |      AS tokens_str
           |  FROM final GROUP BY doc_id)
           |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
           |  COALESCE(a.tokens_str, '') AS tokens_str
           |FROM documents d LEFT JOIN agg a USING (doc_id)
           |ORDER BY doc_id""".stripMargin)
    }

    // --- q160 shape: emitPackedSequences at random budget/shards/token
    // arithmetic — the full sequence REBUILD (tokens, doc ids, offsets)
    // must agree at every parameter point, not just q160's committed one
    for (v <- 0 until 3) {
      val budget = 8L + rnd.nextInt(120)
      val shards = 2 + rnd.nextInt(7)
      val tokMod = 5 + rnd.nextInt(12)
      val mult = 7 + rnd.nextInt(90)
      info(s"v$v emit: budget=$budget shards=$shards tokMod=$tokMod mult=$mult")
      val toksDf = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(tokMod)) > 0, expr(
          s"""transform(sequence(CAST(1 AS BIGINT), pmod(doc_id, $tokMod)),
             |  i -> CAST(pmod(doc_id * $mult + i, 997) AS INT))"""
            .stripMargin))
          .otherwise(expr("CAST(array() AS ARRAY<INT>)")).as("toks"))
      dump(s"fz_emit_$v",
        graft.operators.Packing.emitPackedSequences(
            toksDf, "doc_id", "toks", budget, shards)
          .select(col("shard"), col("seq_idx"), col("n_tokens"),
            array_join(col("seq_tokens"), ",").as("tokens_str"),
            array_join(col("doc_ids"), ",").as("doc_ids_str"),
            array_join(col("doc_offsets"), ",").as("doc_offs_str"))
          .orderBy("shard", "seq_idx"),
        s"""WITH d AS (
           |  SELECT doc_id, ((doc_id % $tokMod) + $tokMod) % $tokMod AS n
           |  FROM documents),
           |toks AS (
           |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
           |    CAST(((doc_id * $mult + i) % 997 + 997) % 997 AS BIGINT)
           |      AS tok
           |  FROM d CROSS JOIN unnest(range(1, n + 1)) r(i)),
           |h AS (
           |  SELECT doc_id, n,
           |    ('0x'||substr(md5('pack#' || doc_id::VARCHAR),1,15))
           |      ::BIGINT AS hv
           |  FROM d),
           |rr AS (
           |  SELECT doc_id, n, hv, hv % $shards AS shard,
           |    CAST(coalesce(SUM(n) OVER (PARTITION BY hv % $shards
           |      ORDER BY hv, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS st
           |  FROM h),
           |pieces AS (
           |  SELECT r.shard, r.hv, r.doc_id, CAST(s.s AS BIGINT) AS seq_idx,
           |    greatest(0, s.s * $budget - r.st) AS frm,
           |    least(r.n, (s.s + 1) * $budget - r.st) AS unt,
           |    r.st + greatest(0, s.s * $budget - r.st) - s.s * $budget
           |      AS off
           |  FROM rr r
           |  CROSS JOIN unnest(range(r.st // $budget,
           |    (r.st + r.n - 1) // $budget + 1)) s(s)
           |  WHERE r.n > 0),
           |ptoks AS (
           |  SELECT p.shard, p.seq_idx, p.hv, p.doc_id, p.off,
           |    list(t.tok ORDER BY t.pos) AS piece
           |  FROM pieces p JOIN toks t ON p.doc_id = t.doc_id
           |    AND t.pos > p.frm AND t.pos <= p.unt
           |  GROUP BY p.shard, p.seq_idx, p.hv, p.doc_id, p.off),
           |seqs AS (
           |  SELECT shard, seq_idx,
           |    flatten(list(piece ORDER BY hv, doc_id)) AS seq_tokens,
           |    list(doc_id ORDER BY hv, doc_id) AS dids,
           |    list(off ORDER BY hv, doc_id) AS doffs
           |  FROM ptoks GROUP BY shard, seq_idx)
           |SELECT shard, seq_idx,
           |  CAST(len(seq_tokens) AS BIGINT) AS n_tokens,
           |  array_to_string(seq_tokens, ',') AS tokens_str,
           |  array_to_string(dids, ',') AS doc_ids_str,
           |  array_to_string(doffs, ',') AS doc_offs_str
           |FROM seqs ORDER BY shard, seq_idx""".stripMargin)
    }

    // --- q159 shape: fitLogistic at random epochs/learning-rate/label
    // modulus — the epoch CTEs are generated programmatically so the
    // integer-gradient replay holds across the parameter space (the
    // floor-division shift must be right for EVERY lr, not just 64)
    for (v <- 0 until 2) {
      val epochs = 1 + rnd.nextInt(3)
      val lr = 16L + rnd.nextInt(241)
      val labelMod = 2 + rnd.nextInt(4)
      info(s"v$v fit: epochs=$epochs lr=$lr labelMod=$labelMod")
      val head =
        s"""WITH d AS (
           |  SELECT doc_id,
           |    CASE WHEN ((doc_id % $labelMod) + $labelMod) % $labelMod
           |      = 0 THEN 1000 ELSE 0 END AS y,
           |    list_filter(regexp_split_to_array(lower(trim(text)),
           |      '\\s+'), x -> x <> '') AS toks
           |  FROM documents),
           |tok AS (
           |  SELECT d.doc_id, u.t AS tok
           |  FROM d CROSS JOIN unnest(d.toks) u(t)
           |  WHERE len(d.toks) > 0),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d
           |      WHERE len(toks) > 0),
           |e1 AS (SELECT doc_id, CAST(y - 500 AS BIGINT) AS err
           |       FROM d WHERE len(toks) > 0),
           |g1 AS (SELECT t.tok, CAST(sum(e.err) AS BIGINT) AS g
           |       FROM tok t JOIN e1 e USING (doc_id) GROUP BY t.tok),
           |w1 AS (SELECT g1.tok,
           |         ($lr * g1.g + 1000000000 * n.n) // (1000 * n.n)
           |           - 1000000 AS w
           |       FROM g1, n)""".stripMargin
      val later = (2 to epochs).map { k =>
        s"""z$k AS (SELECT t.doc_id,
           |         CAST(sum(COALESCE(w${k - 1}.w, 0)) AS BIGINT) AS z
           |       FROM tok t LEFT JOIN w${k - 1}
           |         ON t.tok = w${k - 1}.tok
           |       GROUP BY t.doc_id),
           |e$k AS (SELECT d.doc_id,
           |         d.y - LEAST(1000, GREATEST(0,
           |           500 + ((z$k.z + 4000000) // 4 - 1000000))) AS err
           |       FROM d JOIN z$k USING (doc_id)),
           |g$k AS (SELECT t.tok, CAST(sum(e.err) AS BIGINT) AS g
           |       FROM tok t JOIN e$k e USING (doc_id) GROUP BY t.tok),
           |w$k AS (SELECT g$k.tok,
           |         COALESCE(w${k - 1}.w, 0) +
           |           (($lr * g$k.g + 1000000000 * n.n) // (1000 * n.n)
           |             - 1000000) AS w
           |       FROM g$k LEFT JOIN w${k - 1}
           |         ON g$k.tok = w${k - 1}.tok, n)""".stripMargin
      }
      val sql = (Seq(head) ++ later).mkString(",\n") +
        s"\nSELECT tok AS token, CAST(w AS INTEGER) AS milli_weight" +
        s"\nFROM w$epochs ORDER BY token"
      dump(s"fz_fit_$v",
        graft.text.HashClassifier.fitLogistic(
          docs.select(
            (pmod(col("doc_id"), lit(labelMod)) === 0).as("label"),
            col("text")),
          "text", "label", epochs = epochs, lrNum = lr)
          .orderBy("token"),
        sql)
    }

    // --- r17 shapes -----------------------------------------------------
    val emb = graft.sources.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    // q164 shape: exact squared-L2 top-k at random k / query stride /
    // corpus bound
    for (v <- 0 until 2) {
      val k = 1 + rnd.nextInt(8)
      val qm = 23 + rnd.nextInt(60)
      val cMax = 120 + rnd.nextInt(80)
      info(s"v$v l2: k=$k queryMod=$qm corpusMax=$cMax")
      dump(s"fz_l2_$v",
        graft.similarity.Similarity.bruteForceTopKL2(
          emb.where(pmod(col("id"), lit(qm)) === 0 &&
            col("id") < cMax),
          emb.where(col("id") < cMax), k)
          .orderBy("query_id", "rank"),
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |          FROM embeddings),
           |q AS (SELECT vec_id AS qid, v AS qv FROM v
           |      WHERE ((vec_id % $qm) + $qm) % $qm = 0
           |        AND vec_id < $cMax),
           |c AS (SELECT vec_id AS nid, v AS cv FROM v
           |      WHERE vec_id < $cMax),
           |scored AS (
           |  SELECT q.qid AS query_id, c.nid AS neighbor_id,
           |    list_inner_product(
           |      list_transform(range(1, len(q.qv) + 1),
           |        i -> q.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]),
           |      list_transform(range(1, len(q.qv) + 1),
           |        i -> q.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))
           |      AS dist
           |  FROM q JOIN c ON c.nid <> q.qid),
           |ranked AS (
           |  SELECT query_id, neighbor_id, dist,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, dist
           |FROM ranked WHERE rank <= $k
           |ORDER BY query_id, rank""".stripMargin)
    }

    // q165 shape: RESIDUAL IVF+PQ at random m / nprobe / list count /
    // codebook source — the per-subspace CTE legs are generated so the
    // composition holds across the parameter space, not at m=4 only
    for (v <- 0 until 2) {
      val m = Seq(2, 4, 8)(rnd.nextInt(3))
      val subd = 64 / m
      val nprobe = 1 + rnd.nextInt(3)
      val nc = 4 + rnd.nextInt(5)
      val cbLo = 10 + rnd.nextInt(20)
      val k = 2 + rnd.nextInt(4)
      info(s"v$v residual-pq: m=$m nprobe=$nprobe cents=$nc " +
        s"cbIds=$cbLo..${cbLo + 3} k=$k")
      val cents = emb.where(col("id") < nc)
        .select(col("id").as("cid"), col("vec"))
      val res = graft.similarity.Similarity.ivfResidualize(emb, cents)
      val cb = graft.similarity.Similarity.pqCodebooks(
        res.where(col("id").between(cbLo, cbLo + 3)).select("id", "vec"),
        m)
      val codes = graft.similarity.Similarity.pqEncode(res, cb, m)
      val subsList = (0 until m).mkString(",")
      def slice(src: String) =
        s"$src[CAST(sc.sub*$subd+1 AS INT):CAST((sc.sub+1)*$subd AS INT)]"
      val encJoins = (0 until m).map(s =>
        s"  JOIN enc e$s ON e$s.vec_id = r.vec_id AND e$s.sub = $s")
        .mkString("\n")
      val lutJoins = (0 until m).map(s =>
        s"  JOIN lut l$s ON l$s.qid = q.qid AND l$s.pcid = q.cid\n" +
          s"    AND l$s.sub = $s AND l$s.code = e$s.code")
        .mkString("\n")
      val distSum = (1 until m).foldLeft("l0.d")((acc, i) =>
        s"($acc + l$i.d)")
      dump(s"fz_respq_$v",
        graft.similarity.Similarity.pqAdcTopKResidual(
          emb.where(col("id").between(100, 104)), codes, cb, cents,
          k, m, nprobe)
          .orderBy("query_id", "rank"),
        s"""WITH icents AS (
           |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           |  FROM embeddings WHERE vec_id < $nc),
           |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           |         FROM embeddings),
           |ranked_assign AS MATERIALIZED (
           |  SELECT e.vec_id, c.cid,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY list_cosine_similarity(
           |        CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
           |        c.cid) AS rn
           |  FROM embeddings e CROSS JOIN icents c),
           |resid AS MATERIALIZED (
           |  SELECT v.vec_id, ra.cid,
           |    list_transform(range(1, len(v.v) + 1),
           |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)]) AS rv
           |  FROM vecs v
           |  JOIN ranked_assign ra ON ra.vec_id = v.vec_id AND ra.rn = 1
           |  JOIN icents ic ON ic.cid = ra.cid),
           |pqres AS (SELECT vec_id AS cid, rv AS cv FROM resid
           |          WHERE vec_id BETWEEN $cbLo AND ${cbLo + 3}),
           |subcents AS (
           |  SELECT CAST(s.s AS INT) AS sub, cid,
           |    cv[CAST(s.s*$subd+1 AS INT):CAST((s.s+1)*$subd AS INT)]
           |      AS cvec
           |  FROM pqres CROSS JOIN unnest([$subsList]) s(s)),
           |enc AS MATERIALIZED (
           |  SELECT vec_id, home, sub, code FROM (
           |    SELECT r.vec_id, r.cid AS home, sc.sub, sc.cid AS code,
           |      row_number() OVER (PARTITION BY r.vec_id, sc.sub
           |        ORDER BY list_inner_product(sc.cvec, sc.cvec)
           |          - 2 * list_inner_product(${slice("r.rv")},
           |              sc.cvec) ASC, sc.cid ASC) AS rn
           |    FROM resid r CROSS JOIN subcents sc) t
           |  WHERE rn = 1),
           |qres AS MATERIALIZED (
           |  SELECT ra.vec_id AS qid, ra.cid,
           |    list_transform(range(1, len(v.v) + 1),
           |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)]) AS rv
           |  FROM ranked_assign ra
           |  JOIN vecs v ON v.vec_id = ra.vec_id
           |  JOIN icents ic ON ic.cid = ra.cid
           |  WHERE ra.rn <= $nprobe AND ra.vec_id BETWEEN 100 AND 104),
           |lut AS MATERIALIZED (
           |  SELECT q.qid, q.cid AS pcid, sc.sub, sc.cid AS code,
           |    list_inner_product(sc.cvec, sc.cvec)
           |      - 2 * list_inner_product(${slice("q.rv")}, sc.cvec) AS d
           |  FROM qres q CROSS JOIN subcents sc),
           |qn AS (SELECT qid, cid AS pcid,
           |         list_inner_product(rv, rv) AS qn2 FROM qres),
           |scored AS (
           |  SELECT q.qid AS query_id, r.vec_id AS neighbor_id,
           |    qn.qn2 + $distSum AS dist
           |  FROM resid r
           |  JOIN qres q ON q.cid = r.cid AND r.vec_id <> q.qid
           |$encJoins
           |$lutJoins
           |  JOIN qn ON qn.qid = q.qid AND qn.pcid = q.cid),
           |ranked AS (
           |  SELECT query_id, neighbor_id, dist,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, dist
           |FROM ranked WHERE rank <= $k
           |ORDER BY query_id, rank""".stripMargin)
    }

    // q166/q168 shapes: id-SHIFTED synth corpora — the variant/plant/
    // garbage residue classes land on different ids each run, so the
    // whole id-arithmetic surface is exercised, not one alignment
    for (v <- 0 until 2) {
      val delta = 1 + rnd.nextInt(1000)
      info(s"v$v shifted synth: delta=$delta")
      val shifted = docs.select((col("doc_id") + delta).as("doc_id"))
      dump(s"fz_dhash_$v",
        graft.multimodal.Multimodal.imageDhash(
          graft.multimodal.Multimodal.synthDhashImageBytes(
            shifted, "doc_id"))
          .select(col("media_id"),
            col("dhash").cast("string").as("dhash"))
          .orderBy("media_id"),
        s"""WITH ids AS (SELECT doc_id + $delta AS doc_id
           |             FROM documents),
           |g AS (
           |  SELECT i.doc_id, x.x AS x, y.y AS y,
           |    ((CASE WHEN ((i.doc_id % 10) + 10) % 10 = 1
           |       THEN ((i.doc_id - 1) * 31 + x.x * 17 + y.y * 53)
           |         * ((i.doc_id - 1) + x.x + y.y + 7) +
           |         (CASE WHEN x.x = 0 AND y.y = 0 THEN 1 ELSE 0 END)
           |       ELSE (i.doc_id * 31 + x.x * 17 + y.y * 53)
           |         * (i.doc_id + x.x + y.y + 7)
           |     END) % 256 + 256) % 256 AS gv
           |  FROM ids i
           |  CROSS JOIN unnest(range(0, 9)) x(x)
           |  CROSS JOIN unnest(range(0, 8)) y(y)),
           |bits AS (
           |  SELECT a.doc_id, CAST(a.y * 8 + a.x AS INT) AS b,
           |    CASE WHEN n.gv > a.gv THEN 1 ELSE 0 END AS bit
           |  FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.y = a.y
           |    AND n.x = a.x + 1
           |  WHERE a.x < 8),
           |h AS (
           |  SELECT doc_id,
           |    CAST(sum(CASE WHEN b >= 32
           |      THEN CAST(bit AS BIGINT) << (b - 32) ELSE 0 END)
           |      AS BIGINT) AS hi,
           |    CAST(sum(CASE WHEN b < 32
           |      THEN CAST(bit AS BIGINT) << b ELSE 0 END)
           |      AS BIGINT) AS lo
           |  FROM bits GROUP BY doc_id)
           |SELECT i.doc_id AS media_id,
           |  CASE WHEN ((i.doc_id % 11) + 11) % 11 = 6 THEN NULL
           |    ELSE CAST(CAST(CAST(h.hi AS HUGEINT) * 4294967296 + h.lo
           |      - CASE WHEN h.hi >= 2147483648
           |          THEN CAST('18446744073709551616' AS HUGEINT)
           |          ELSE 0 END AS BIGINT) AS VARCHAR)
           |  END AS dhash
           |FROM ids i JOIN h USING (doc_id)
           |ORDER BY media_id""".stripMargin)
      dump(s"fz_wet_$v",
        graft.sources.Warc.wetDocs(
          graft.sources.Warc.explodeWarcBlobs(
            graft.sources.Warc.synthWetBytes(shifted, "doc_id")))
          .select(col("media_id"), col("rec_idx"), col("url"),
            col("wet_text"), col("content_length"))
          .orderBy("media_id", "rec_idx"),
        s"""WITH m AS (
           |  SELECT doc_id + $delta AS doc_id FROM documents),
           |m2 AS (
           |  SELECT doc_id,
           |    ((doc_id % 3) + 3) % 3 AS m3,
           |    ((doc_id % 9) + 9) % 9 AS m9,
           |    ((doc_id % 11) + 11) % 11 AS m11,
           |    ((doc_id % 13) + 13) % 13 AS m13,
           |    ((doc_id % 100) + 100) % 100 AS site
           |  FROM m),
           |r AS (
           |  SELECT m2.*, t.k FROM m2, (VALUES (0), (1)) t(k)
           |  WHERE m2.m11 <> 3 AND (t.k = 0 OR m2.m3 >= 1)),
           |rec AS (
           |  SELECT doc_id, k, m9, m13,
           |    'http://wet' || CAST(site AS VARCHAR) || '.org/d' ||
           |      CAST(k AS VARCHAR) AS url,
           |    'Doc ' || CAST(doc_id AS VARCHAR) || ' text ' ||
           |      CAST(k AS VARCHAR) || ' ' ||
           |      repeat('w', CAST((((doc_id * 5 + k) % 40) + 40) % 40
           |        + 5 AS INT)) AS text
           |  FROM r)
           |SELECT doc_id AS media_id, CAST(k + 1 AS BIGINT) AS rec_idx,
           |  url,
           |  CASE WHEN m9 = 4 THEN NULL ELSE text END AS wet_text,
           |  CAST(length(text)
           |    + CASE WHEN m13 = 5 THEN 3 ELSE 0 END
           |    + CASE WHEN m9 = 4 THEN 1 ELSE 0 END AS BIGINT)
           |    AS content_length
           |FROM rec ORDER BY media_id, rec_idx""".stripMargin)
    }

    Files.writeString(Paths.get(s"$out/oracle_sql.json"),
      oracles.map { case (k, s) => s"${jq(k)}: ${jq(s)}" }
        .mkString("{", ",", "}"))
    val proc = new ProcessBuilder(
      "python3", "tools/check_oracle.py", sf, out)
      .directory(new java.io.File("/root/repo"))
      .redirectErrorStream(true).start()
    val log = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val rc = proc.waitFor()
    info(log.linesIterator.filter(_.startsWith("FAIL")).take(5)
      .mkString("; "))
    assert(rc == 0 && log.contains("0 failed"),
      s"fuzz parity failed (master seed $masterSeed):\n$log")
  }
}
