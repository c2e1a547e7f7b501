package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.sources.Sources
import graft.text.{TextOps, UrlOps}
import graft.queries.Relational.{Q, decStr}

/** Beyond-reference operators for 100 TB training-data pipelines
  * (deduplication, similarity search, multimodal columns, text analysis),
  * each with a DuckDB oracle. Sampling predicates (doc_id/vec_id bounds) are
  * absolute, not sf-relative, so pairwise stages stay bounded while the
  * map-side stages sweep the full table at every scale factor.
  *
  * Cross-engine notes: 60-bit hashes derive from md5 (identical in both
  * engines); cosine arithmetic was verified bit-identical between Spark's
  * sequential double fold and DuckDB's list_cosine_similarity over DOUBLE[]
  * (maxdiff 0.0 over 3160 pairs), so ranking and thresholds agree exactly.
  */
object TrainingData {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Sources.table(s, dir, name)

  private val dec = DecimalType(38, 4)

  private val enStop = TextOps.langStopwords.head._2

  /** 16-char unsegmented-script alphabet for the q181-q183 exhibits
    * (common hanzi, one code point each — so Spark's char-indexed
    * substr and DuckDB's substr walk it identically). */
  private val cjkAlph =
    "\u7684\u4E00\u662F\u4E0D\u4E86\u4EBA\u6211\u5728" +
      "\u6709\u4ED6\u8FD9\u4E2D\u5927\u6765\u4E0A\u56FD"

  /** Deterministic unsegmented-script exhibit text: L = 40 + pmod(eid,
    * 20) characters, char i = cjkAlph[first md5 hex digit of
    * "eid_i"] — md5-driven (not a small-modulus polynomial, which
    * aliases across ids and floods the pairwise stage with accidental
    * full-jaccard pairs) so the DuckDB oracle replays every character
    * exactly. pmod(id,10)=1 is the ONE-CHAR near-dup plant of id−1
    * (char 0 shifted one alphabet slot). No whitespace anywhere: the
    * whole doc is a single "word", which is precisely what makes
    * word-shingle dedup blind on these scripts. */
  private def cjkSynthText(id: Column): Column = {
    val eid = when(pmod(id, lit(10)) === 1, id - 1).otherwise(id)
    val L = lit(40) + pmod(eid, lit(20))
    def idx(i: Column): Column =
      conv(substring(md5(concat_ws("_", eid, i)), 1, 1), 16, 10)
        .cast(IntegerType)
    def pidx(i: Column): Column =
      when(pmod(id, lit(10)) === 1 && i === 0,
        pmod(idx(i) + 1, lit(16))).otherwise(idx(i))
    array_join(transform(sequence(lit(0L), L.cast(LongType) - 1), i =>
      lit(cjkAlph).substr((pidx(i) + 1).cast(IntegerType), lit(1))), "")
  }

  val all: Seq[Q] = Seq(

    // ---- Deduplication -------------------------------------------------

    // Exact dedup: hash-groupBy on content md5 (shuffle moves 24 bytes per
    // doc, never the text). The self-union plants known duplicates.
    Q("q30_dedup_exact",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val planted = docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000)
        Dedup.exactGroups(docs.unionByName(planted), "doc_id", "text")
          .orderBy("fp")
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
             |SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM all_docs GROUP BY md5(text) ORDER BY fp""".stripMargin)),

    // MinHash signatures: 16-member Kirsch–Mitzenmacher family off ONE
    // md5 per shingle — h_i = (ha + i*hb) mod 2^56, ha/hb = two 56-bit
    // halves of the digest (hex chars 1-14 / 17-30). 56 bits keeps
    // ha + 15*hb < 2^60, exact in signed BIGINT in both engines.
    Q("q31_minhash_signatures",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 64)
        Dedup.minhash(Dedup.shingles(docs, "doc_id", "text", 3), "doc_id", 16)
          .orderBy("doc_id", "seed")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 64),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |h AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(shingle),1,14))::BIGINT AS ha,
             |         ('0x'||substr(md5(shingle),17,14))::BIGINT AS hb
             |  FROM sh)
             |SELECT doc_id, CAST(seed AS INT) AS seed,
             |       min((ha + seed*hb) % (1::BIGINT << 56)) AS minhash
             |FROM h CROSS JOIN range(0,16) r(seed)
             |GROUP BY doc_id, seed ORDER BY doc_id, seed""".stripMargin)),

    // MinHash-LSH candidate pairs: 4 bands x 4 rows; docs meet only on a
    // shared band bucket (join fan-out bounded by bucket size, not n^2).
    // Bound 1024 (not 256): the sf0.1 corpus's planted near-dups are
    // spread thinner, and a candidate query that finds ZERO pairs at the
    // grading scale factor exercises nothing — 1024 yields pairs at all
    // three SFs (28/25/7).
    Q("q32_minhash_lsh_candidates",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 1024)
        // probeParts = 0: 1k-doc exhibit — the pair fan-out fits one task,
        // the pin's extra exchanges would be pure overhead (resolvePin doc)
        Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, probeParts = 0)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 1024),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |h AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(shingle),1,14))::BIGINT AS ha,
             |         ('0x'||substr(md5(shingle),17,14))::BIGINT AS hb
             |  FROM sh),
             |mh AS (
             |  SELECT doc_id, CAST(seed AS INT) AS seed,
             |         min((ha + seed*hb) % (1::BIGINT << 56)) AS minhash
             |  FROM h CROSS JOIN range(0,16) r(seed)
             |  GROUP BY doc_id, seed),
             |bands AS (
             |  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             |         string_agg(minhash::VARCHAR, '|' ORDER BY seed) AS sig
             |  FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT))
             |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
             |WHERE a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // The PRODUCTION MinHash width: 64 hashes / 16 bands (4 rows per
    // band), the q102 move applied to the minhash path — q32's 16-hash/
    // 4-band setting is exhibit-sized, and the banding S-curve it induces
    // (match probability 1-(1-j^4)^4) is far too permissive for corpus
    // scale, where band-bucket collisions must stay similarity-driven.
    // 64/16 keeps 4-row bands (same per-band precision) with 4x the
    // detection chances, the standard production operating point. The
    // K-M family stays exact at i=63: ha + 63*hb < 2^56 * 64 = 2^62,
    // inside signed-64 in both engines (the family scaladoc's bound
    // generalizes to numHashes <= 128). This query pins the wide setting
    // to the oracle gate so production width, not just the exhibit, is
    // hash-verified every round; the sf1.0 pair-growth curve for this
    // setting is in SCALING.md.
    Q("q103_minhash_lsh_wide",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 1024)
        Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, probeParts = 0)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 1024),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |h AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(shingle),1,14))::BIGINT AS ha,
             |         ('0x'||substr(md5(shingle),17,14))::BIGINT AS hb
             |  FROM sh),
             |mh AS (
             |  SELECT doc_id, CAST(seed AS INT) AS seed,
             |         min((ha + seed*hb) % (1::BIGINT << 56)) AS minhash
             |  FROM h CROSS JOIN range(0,64) r(seed)
             |  GROUP BY doc_id, seed),
             |bands AS (
             |  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             |         string_agg(minhash::VARCHAR, '|' ORDER BY seed) AS sig
             |  FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT))
             |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
             |WHERE a.doc_id < b.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // Incremental (delta) dedup: admission decisions for a new batch
    // against the EXISTING corpus's persisted band-signature index — the
    // corpus contributes one index scan, zero shuffle, never its text
    // (the daily 100 TB operation; see Dedup.incrementalLshDedup). The
    // index is docs < 512; the delta is docs 512-767 plus planted copies
    // of every 16th indexed doc (id + 200000) so index hits are
    // guaranteed. Greedy first-seen-wins within the batch (min smaller
    // colliding id), min colliding index id across. Bounds 256/448 keep
    // both the novel-doc (keep=true) and planted-dup paths populated at
    // every SF (the corpus has 500 docs at sf0.001/0.01).
    Q("q117_incremental_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val existing = docs.where(col("doc_id") < 256)
        val planted = existing.where(col("doc_id") % 16 === 0)
          .withColumn("doc_id", col("doc_id") + 200000)
        val incoming = docs.where(col("doc_id") >= 256 && col("doc_id") < 448)
          .unionByName(planted)
        val index = Dedup.lshBands(
          Dedup.minhashWide(Dedup.shingles(existing, "doc_id", "text", 3),
            "doc_id", 16), "doc_id", 16, 4)
        // probeParts = 0: a few-hundred-doc exhibit delta (resolvePin doc)
        Dedup.incrementalLshDedup(index, incoming, "doc_id", "text",
          3, 16, 4, probeParts = 0)
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 448
             |  UNION ALL
             |  SELECT doc_id + 200000 AS doc_id, text FROM documents
             |  WHERE doc_id < 256 AND doc_id % 16 = 0),
             |d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM raw),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |h AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(shingle),1,14))::BIGINT AS ha,
             |         ('0x'||substr(md5(shingle),17,14))::BIGINT AS hb
             |  FROM sh),
             |mh AS (
             |  SELECT doc_id, CAST(seed AS INT) AS seed,
             |         min((ha + seed*hb) % (1::BIGINT << 56)) AS minhash
             |  FROM h CROSS JOIN range(0,16) r(seed)
             |  GROUP BY doc_id, seed),
             |bands AS (
             |  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             |         string_agg(minhash::VARCHAR, '|' ORDER BY seed) AS sig
             |  FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
             |idx AS (SELECT * FROM bands WHERE doc_id < 256),
             |newb AS (SELECT * FROM bands WHERE doc_id >= 256),
             |vsidx AS (
             |  SELECT n.doc_id, min(i.doc_id) AS dup_of_index
             |  FROM newb n JOIN idx i ON n.band = i.band AND n.sig = i.sig
             |  GROUP BY n.doc_id),
             |within AS (
             |  SELECT b.doc_id, min(a.doc_id) AS dup_of_batch
             |  FROM newb a JOIN newb b ON a.band = b.band AND a.sig = b.sig
             |   AND a.doc_id < b.doc_id
             |  GROUP BY b.doc_id)
             |SELECT n.doc_id, v.dup_of_index, w.dup_of_batch,
             |       (v.dup_of_index IS NULL AND w.dup_of_batch IS NULL) AS keep
             |FROM (SELECT DISTINCT doc_id FROM raw WHERE doc_id >= 256) n
             |LEFT JOIN vsidx v USING (doc_id)
             |LEFT JOIN within w USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // SimHash (16-bit oracle-sized; library supports up to 60).
    Q("q33_simhash",
      (s, dir) => Dedup.simhash(
        t(s, dir, "documents").where(col("doc_id") < 256), "doc_id", "text", 16)
        .orderBy("doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b)
             |SELECT doc_id,
             |       CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // SimHash pair search: near-dup candidates by hamming distance over the
    // 8-byte signatures (never the text).
    Q("q67_simhash_pairs",
      (s, dir) => Dedup.simhashNearDups(
        Dedup.simhash(t(s, dir, "documents").where(col("doc_id") < 256),
          "doc_id", "text", 16),
        "doc_id", 3).orderBy("id_a", "id_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Banded (pigeonhole) simhash near-dup search — the 100 TB candidate
    // path: equi-join on (chunk_idx, chunk_value), Hamming-verify only the
    // collisions. Exact same output as q67's all-pairs form by the
    // pigeonhole argument, so the oracle IS the all-pairs SQL.
    Q("q90_simhash_banded",
      (s, dir) => Dedup.simhashBandedDups(
        Dedup.simhash(t(s, dir, "documents").where(col("doc_id") < 256),
          "doc_id", "text", 16),
        "doc_id", 16, 3, probeParts = 0).orderBy("id_a", "id_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // The PRODUCTION signature width: 32-bit simhash, same pigeonhole
    // banding, same maxHamming. 16-bit signatures saturate at corpus scale
    // (SCALING.md sf1.0 rehearsal: 18.9x pair growth for 10x docs because
    // 65k distinct signatures collide from space exhaustion, not
    // similarity); 32 bits keeps the pair curve linear. This query pins
    // the wide-signature path to the oracle gate so the production
    // setting, not just the 16-bit exhibit, is hash-verified every round.
    Q("q102_simhash_wide",
      (s, dir) => Dedup.simhashBandedDups(
        Dedup.simhash(t(s, dir, "documents").where(col("doc_id") < 256),
          "doc_id", "text", 32),
        "doc_id", 32, 3, probeParts = 0).orderBy("id_a", "id_b"),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,32) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Candidate pairs -> duplicate GROUPS: connected components by min-
    // label propagation over the banded-simhash candidate graph. (a,b) +
    // (b,c) collapse into {a,b,c} even though (a,c) never met in a bucket.
    // The oracle computes reachability with a recursive CTE and takes each
    // node's min reachable id — the same fixpoint the Pregel-style loop
    // converges to.
    Q("q91_dup_groups",
      (s, dir) => Dedup.connectedComponents(
        Dedup.simhashBandedDups(
          Dedup.simhash(t(s, dir, "documents").where(col("doc_id") < 256),
            "doc_id", "text", 16),
          "doc_id", 16, 3, probeParts = 0)).orderBy("id"),
      Some("""WITH RECURSIVE tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
             |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
             |reach(id, label) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
             |SELECT id, min(label) AS component
             |FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // Duplicate groups -> the decision a dedup sweep actually SHIPS: one
    // keeper per group (longest doc wins, ascending id breaks ties), every
    // ungrouped doc passing through keep=true without ever sorting on
    // component. Same candidate graph as q91; the oracle replays it and
    // adds the left-join + per-component window.
    Q("q112_dedup_survivors",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 256)
        Dedup.survivors(
          docs.select("doc_id", "n_chars"),
          Dedup.simhashBandedDups(
            Dedup.simhash(docs, "doc_id", "text", 16),
            "doc_id", 16, 3, probeParts = 0),
          "doc_id", Seq(col("n_chars").desc))
          .select("doc_id", "component", "keep")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
             |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
             |reach(id, label) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
             |lab AS (
             |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
             |         d.n_chars
             |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
             |  WHERE d.doc_id < 256)
             |SELECT doc_id, component,
             |       row_number() OVER (PARTITION BY component
             |                          ORDER BY n_chars DESC, doc_id) = 1 AS keep
             |FROM lab ORDER BY doc_id""".stripMargin)),

    // The dedup dashboard number: per-source duplication rate off the
    // survivor decisions — keep/drop counts and the drop fraction each
    // source contributes. One groupBy over q112's output joined back to
    // source metadata (the join is on the doc id, so it rides the same
    // key as the survivor branches).
    Q("q114_dedup_rate_by_source",
      (s, dir) => {
        val docs = t(s, dir, "documents").where(col("doc_id") < 256)
        Dedup.survivors(
          docs.select("doc_id", "n_chars"),
          Dedup.simhashBandedDups(
            Dedup.simhash(docs, "doc_id", "text", 16),
            "doc_id", 16, 3, probeParts = 0),
          "doc_id", Seq(col("n_chars").desc))
          .join(docs.select("doc_id", "source"), Seq("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          // integer basis points (floor): exact in both engines, unlike a
          // double quotient whose half-boundary rounding can diverge
          .withColumn("drop_rate_bp",
            expr("(n_docs - n_kept) * 10000 div n_docs"))
          .orderBy("source")
      },
      Some("""WITH RECURSIVE tok AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |  FROM documents WHERE doc_id < 256),
             |h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, b, SUM(((h >> b) & 1) * 2 - 1) AS votes
             |  FROM h CROSS JOIN range(0,16) r(b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id,
             |         CAST(SUM(CASE WHEN votes > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
             |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
             |reach(id, label) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
             |lab AS (
             |  SELECT d.doc_id, d.source,
             |         COALESCE(c.component, d.doc_id) AS component, d.n_chars
             |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
             |  WHERE d.doc_id < 256),
             |dec AS (
             |  SELECT doc_id, source,
             |         (row_number() OVER (PARTITION BY component
             |                             ORDER BY n_chars DESC, doc_id) = 1) AS keep
             |  FROM lab)
             |SELECT source, count(*) AS n_docs,
             |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       CAST((count(*) - SUM(CASE WHEN keep THEN 1 ELSE 0 END))
             |         * 10000 // count(*) AS BIGINT) AS drop_rate_bp
             |FROM dec GROUP BY source ORDER BY source""".stripMargin)),

    // Pairwise n-gram Jaccard on distinct 3-gram shingle sets.
    // Bound 1024 for the same reason as q32: nonzero pairs at every SF.
    Q("q34_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccard(
        t(s, dir, "documents").where(col("doc_id") < 1024), "doc_id", "text",
        3, 0.2).orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 1024),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id)
             |SELECT id_a, id_b, inter,
             |       inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
             |FROM inter
             |JOIN sizes sa ON sa.doc_id = id_a
             |JOIN sizes sb ON sb.doc_id = id_b
             |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.2
             |ORDER BY id_a, id_b""".stripMargin)),

    // One-sided containment over the same shingle sets: a short doc fully
    // quoted inside a long one scores ~1 here but arbitrarily low on
    // Jaccard — the score a quote/subset-dedup pass needs. Lower threshold
    // than q34's jaccard (containment >= jaccard always) to keep the
    // output set distinct from it.
    Q("q113_ngram_containment",
      (s, dir) => Dedup.ngramContainment(
        t(s, dir, "documents").where(col("doc_id") < 1024), "doc_id", "text",
        3, 0.35).orderBy("id_a", "id_b"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 1024),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id)
             |SELECT id_a, id_b, inter,
             |       inter / least(sa.n_sh, sb.n_sh) AS containment
             |FROM inter
             |JOIN sizes sa ON sa.doc_id = id_a
             |JOIN sizes sb ON sb.doc_id = id_b
             |WHERE inter / least(sa.n_sh, sb.n_sh) >= 0.35
             |ORDER BY id_a, id_b""".stripMargin)),

    // Cross-document repeated spans: maximal runs of 8-token windows whose
    // content occurs verbatim in >= 2 documents — the span-level dedup
    // doc-level similarity cannot see (shared boilerplate paragraphs).
    // Unbounded over the corpus: the pipeline is O(tokens), no pair join.
    // The oracle replays the 112-bit window-hash halves (minhashWide's
    // md5 split), the min<>max cross-doc test, and the pos - row_number
    // islands grouping verbatim.
    Q("q115_dup_spans",
      (s, dir) => Dedup.duplicateSpans(
        t(s, dir, "documents"), "doc_id", "text", 8)
        .orderBy("doc_id", "span_start"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |w0 AS (
             |  SELECT doc_id, i AS pos,
             |         md5(array_to_string(d.toks[i:i+7], ' ')) AS h
             |  FROM d CROSS JOIN unnest(range(1, len(d.toks)-6)) u(i)
             |  WHERE len(d.toks) >= 8),
             |w AS (
             |  SELECT doc_id, pos,
             |         ('0x'||substr(h,1,14))::BIGINT AS ha,
             |         ('0x'||substr(h,17,14))::BIGINT AS hb
             |  FROM w0),
             |dup AS (SELECT ha, hb FROM w GROUP BY ha, hb
             |        HAVING min(doc_id) <> max(doc_id)),
             |m AS (
             |  SELECT w.doc_id, w.pos,
             |         row_number() OVER (PARTITION BY w.doc_id
             |                            ORDER BY w.pos) AS rn
             |  FROM w JOIN dup USING (ha, hb))
             |SELECT doc_id, min(pos) AS span_start,
             |       max(pos) + 7 AS span_end,
             |       CAST(count(*) AS BIGINT) AS n_windows
             |FROM m GROUP BY doc_id, pos - rn
             |ORDER BY doc_id, span_start""".stripMargin)),

    // Duplicate-span REMOVAL — q115's rewrite step: excise every
    // non-canonical duplicated run (canonical = min doc_id over the window
    // hash; CANONICAL-WINS on overlap — a token also covered by a window
    // this doc is canonical for is kept, so at least one copy of each
    // passage survives corpus-wide, exactly one when windows don't
    // overlap) and
    // reassemble the kept token stream. Unbounded over the corpus. The
    // oracle replays the q115 window-hash head, adds the canon test
    // on both sides (rm + keep span lists, FILTER-split), and
    // rebuilds the text with 1-based index lambdas (DuckDB list lambdas
    // index from 1; Spark's transform from 0 — the +1 lives on the Spark
    // side). text_clean is whitespace-normalized lowercase by contract, so
    // string equality across engines is exact. The query emits only the
    // REWRITTEN docs (n_removed > 0): the interesting output, and the
    // filter makes the result's cardinality depend on the rewrite — a
    // row-per-doc form lets Catalyst ELIMINATE the unique-keyed left join
    // under the bench's count() (measured: 0.14 s of nothing), so the
    // untouched-majority passthrough rides q115 + this instead.
    Q("q121_remove_dup_spans",
      (s, dir) => Dedup.removeDuplicateSpans(
        t(s, dir, "documents"), "doc_id", "text", 8)
        .where(col("n_removed") > 0)
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |w0 AS (
             |  SELECT doc_id, i AS pos,
             |         md5(array_to_string(d.toks[i:i+7], ' ')) AS h
             |  FROM d CROSS JOIN unnest(range(1, len(d.toks)-6)) u(i)
             |  WHERE len(d.toks) >= 8),
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
             |  SELECT doc_id, iscanon, min(pos) AS s, max(pos) + 7 AS e
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
             |FROM kept WHERE n0 - len(ktoks) > 0 ORDER BY doc_id""".stripMargin)),

    // Cross-source overlap matrix (Dedup.sourceOverlapMatrix): shared
    // distinct-shingle counts + vocabulary Jaccard/containment per source
    // pair — the mirror/subset-crawl report run before corpus mixing.
    // Shingles hash to 60 bits map-side so the exchange carries
    // (source, 8-byte key), never strings; the self-join fans out at
    // most |sources| rows per key. The oracle replays the hash64
    // arithmetic; long/long division is IEEE double in both engines so
    // jaccard/containment hash-gate exactly.
    // persistIntermediate: the vocabulary subtree (tokenize + explode +
    // distinct) feeds both self-join branches and the size aggregate —
    // measured 2.66 -> 2.10 s at sf0.1 when materialized once.
    Q("q126_source_overlap_matrix",
      (s, dir) => Dedup.sourceOverlapMatrix(
          t(s, dir, "documents"), "text", "source", 3,
          persistIntermediate = true)
        .orderBy("stratum_a", "stratum_b"),
      Some("""WITH d AS (
             |  SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT source,
             |         ('0x'||substr(md5(u.s),1,15))::BIGINT AS k
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
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
             |ORDER BY stratum_a, stratum_b""".stripMargin)),

    // Embedding-cosine near-duplicate pairs (bit-identical cross-engine
    // cosine -> the threshold cut agrees exactly).
    Q("q35_embedding_neardup",
      (s, dir) => Similarity.cosineNearDups(
        t(s, dir, "embeddings").where(col("vec_id") < 300)
          .select(col("vec_id").as("id"), col("embedding").as("vec")), 0.3)
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 300)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |       list_cosine_similarity(a.v, b.v) AS sim
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(a.v, b.v) > 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    // Bucketed embedding near-dup pairs — q35's 100 TB path: sign-LSH
    // signatures, pigeonhole-banded candidate generation (equi-join on
    // signature chunks, never |corpus|² — the simhashBandedDups structure
    // applied to embeddings), cosine-verify only the collisions. Near-dups
    // are PLANTED (the q30 pattern): each vec_id < 300 gets a copy at
    // id+10000 with dimension 0 zeroed — cosine(orig, copy) >= 0.92 on
    // this corpus while the max random pair is ~0.60, and only sign bit 0
    // can differ, so Hamming(orig, copy) <= 1 DETERMINISTICALLY and the
    // banded result at maxMismatch=2 equals the all-pairs form — the
    // oracle is therefore exactly q35's all-pairs SQL over the planted
    // corpus (recall-complete by construction, not by measurement).
    Q("q100_embedding_neardup_bucketed",
      (s, dir) => {
        val e = t(s, dir, "embeddings").where(col("vec_id") < 300)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val planted = e.select((col("id") + 10000).as("id"),
          transform(col("vec"),
            (x, i) => when(i === 0, lit(0f)).otherwise(x)).as("vec"))
        Similarity.lshNearDupPairs(e.unionByName(planted), 0.8, 16, 2,
          probeParts = 0)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 300),
             |z AS (SELECT id + 10000 AS id,
             |             list_transform(v, (x, i) -> CASE WHEN i = 1
             |               THEN CAST(0 AS DOUBLE) ELSE x END) AS v
             |      FROM e),
             |allv AS (SELECT * FROM e UNION ALL SELECT * FROM z)
             |SELECT a.id AS id_a, b.id AS id_b,
             |       list_cosine_similarity(a.v, b.v) AS sim
             |FROM allv a JOIN allv b ON a.id < b.id
             |WHERE list_cosine_similarity(a.v, b.v) > 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // SemDeDup-style clustered semantic near-dup pairs: nearest-of-8-seed
    // centroid assignment (broadcast, cid tie-break — both engines rank
    // the bit-identical cosine), then pairs ONLY within a cluster above
    // cosine 0.3 (probed: ~140-180 pairs at every SF). The third near-dup
    // family member after all-pairs (q35) and sign-LSH-banded (q100) —
    // this one finds SEMANTIC redundancy past the Hamming horizon, at
    // Σ cluster² cost instead of |corpus|². Seed centroids are the first
    // 8 vectors — deterministic and oracle-replayable, where a k-means
    // fit would gate on ulp-fragile learned floats.
    Q("q111_semantic_cluster_dedup",
      (s, dir) => {
        val e = t(s, dir, "embeddings").where(col("vec_id") < 400)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = t(s, dir, "embeddings").where(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("vec"))
        // probeParts = 0: 400-vec exhibit (resolvePin doc)
        Similarity.clusteredNearDups(e, cents, 0.3, probeParts = 0)
          .orderBy("cid", "id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 400),
             |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |      FROM embeddings WHERE vec_id < 8),
             |scored AS (SELECT e.id, c.cid,
             |             list_cosine_similarity(e.v, c.cv) AS csim
             |           FROM e CROSS JOIN c),
             |assigned AS (SELECT id, cid FROM (
             |  SELECT id, cid, row_number() OVER (PARTITION BY id
             |         ORDER BY csim DESC, cid) AS rn
             |  FROM scored) WHERE rn = 1),
             |av AS (SELECT a.cid, e.id, e.v FROM assigned a JOIN e USING (id))
             |SELECT a.cid AS cid, a.id AS id_a, b.id AS id_b,
             |       list_cosine_similarity(a.v, b.v) AS sim
             |FROM av a JOIN av b ON a.cid = b.cid AND a.id < b.id
             |WHERE list_cosine_similarity(a.v, b.v) > 0.3
             |ORDER BY a.cid, id_a, id_b""".stripMargin)),

    // Eval-set contamination sweep (n-gram decontamination): every 10th
    // document plays the benchmark/eval set, the rest are the training
    // corpus; a training doc sharing >= 5 distinct trigrams with an eval
    // doc is flagged with its overlap and the fraction of the eval doc
    // covered. minOverlap=5 prunes the incidental 1-4-gram collisions the
    // fixture corpus produces (probed: >=1 matches thousands of random
    // pairs, >=5 only the genuine near-dup plants, non-empty at all three
    // scale factors). Oracle reuses q34's shingle SQL shape verbatim.
    Q("q101_contamination",
      (s, dir) => Dedup.contamination(
        t(s, dir, "documents").where(col("doc_id") % 10 =!= 0),
        t(s, dir, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", "text", 3, 5)
        .orderBy("train_id", "eval_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 10 <> 0),
             |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 10 = 0),
             |sizes AS (SELECT eval_id, count(*) AS eval_shingles FROM ev GROUP BY 1),
             |ov AS (
             |  SELECT train_id, eval_id, count(*) AS n_overlap
             |  FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
             |SELECT train_id, eval_id, n_overlap,
             |       n_overlap / s.eval_shingles AS eval_coverage
             |FROM ov JOIN sizes s USING (eval_id)
             |WHERE n_overlap >= 5
             |ORDER BY train_id, eval_id""".stripMargin)),

    // Decontaminated training set — q101's removal step: the same
    // detection pipeline, then a left anti join keeps only training docs
    // with NO >= 5-trigram overlap against any eval doc. Oracle = q101's
    // hit SQL turned into NOT EXISTS over the training side.
    Q("q124_decontaminated_train",
      (s, dir) => Dedup.decontaminate(
        t(s, dir, "documents").where(col("doc_id") % 10 =!= 0),
        t(s, dir, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", "text", 3, 5)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 10 <> 0),
             |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 10 = 0),
             |bad AS (
             |  SELECT DISTINCT train_id
             |  FROM (SELECT train_id, eval_id, count(*) AS n_overlap
             |        FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
             |  WHERE n_overlap >= 5)
             |SELECT doc_id, source FROM documents
             |WHERE doc_id % 10 <> 0
             |  AND doc_id NOT IN (SELECT train_id FROM bad)
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified train/val/test split: content-hash bucket
    // (never Math.random — reproducible across runs/clusters/engines) with
    // per-language stratification counts. The same predicate is a 10%
    // deterministic sample at any scale.
    Q("q68_stratified_split",
      (s, dir) => {
        val split = graft.operators.Downsample.splitLabel(col("doc_id"))
        t(s, dir, "documents")
          .select(col("lang"), split.as("split"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n"))
          .orderBy("lang", "split")
      },
      Some("""WITH b AS (
             |  SELECT lang,
             |    ('0x'||substr(md5('split#' || doc_id::VARCHAR),1,15))::BIGINT % 100 AS bucket
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val'
             |       ELSE 'test' END AS split,
             |  count(*) AS n
             |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // Leakage-safe split, content-keyed: the q68 assignment re-keyed on
    // md5(text) so byte-identical duplicates can never straddle the
    // train/eval boundary (q68's id-keyed hash puts a doc and its exact
    // copy in independent buckets). n_contents counts distinct content
    // classes per split; the oracle replays the fingerprint, the
    // "split#" hash arithmetic, and the bucket thresholds verbatim.
    Q("q116_leakage_safe_split",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val comps = docs.select(col("doc_id").as("id"),
          md5(col("text")).as("component"))
        graft.operators.Downsample.leakageSafeSplit(docs, comps, "doc_id")
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_contents"))
          .orderBy("split")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, md5(text) AS fp,
             |    ('0x'||substr(md5('split#' || md5(text)),1,15))::BIGINT % 100 AS bucket
             |  FROM documents)
             |SELECT CASE WHEN bucket < 80 THEN 'train'
             |            WHEN bucket < 90 THEN 'val'
             |            ELSE 'test' END AS split,
             |       count(*) AS n_docs,
             |       count(DISTINCT fp) AS n_contents
             |FROM b GROUP BY 1 ORDER BY split""".stripMargin)),

    // ---- Similarity search --------------------------------------------

    // Exact brute-force cosine top-k: broadcast 5 query vectors against the
    // full corpus; one map-side scoring pass + per-query top-k window.
    Q("q36_ann_bruteforce",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        Similarity.bruteForceTopK(e.where(col("id") < 5), e, 10)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |scored AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |         list_cosine_similarity(q.v, c.v) AS sim
             |  FROM q JOIN c ON q.vec_id <> c.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |              ORDER BY sim DESC, neighbor_id) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, sim
             |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // LSH-bucketed ANN (the 100 TB scale path): sign-bit bucket signature,
    // equi-join on bucket, rank within bucket only.
    Q("q37_ann_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        Similarity.lshTopK(e.where(col("id") < 5), e, 3, 6)
          .orderBy("query_id", "rank")
      },
      Some {
        val bucket = (0 until 6).map(i =>
          s"(CASE WHEN v[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           |           CAST($bucket AS BIGINT) AS bucket
           |           FROM embeddings),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         list_cosine_similarity(q.v, c.v) AS sim
           |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
           |  WHERE q.vec_id < 5),
           |ranked AS (
           |  SELECT query_id, neighbor_id, sim,
           |         CAST(row_number() OVER (PARTITION BY query_id
           |              ORDER BY sim DESC, neighbor_id) AS INT) AS rank
           |  FROM scored)
           |SELECT query_id, rank, neighbor_id, sim
           |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
      }),

    // ---- Text analysis -------------------------------------------------

    // Token counting + quality scoring (map-side only; no shuffle).
    Q("q38_text_stats",
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextOps.tokenCountBpe(col("text")).as("n_tokens_bpe"),
        TextOps.punctRatio(col("text")).as("punct_ratio"),
        TextOps.stopwordRatio(col("text"), enStop).as("stopword_ratio"),
        TextOps.qualityScore(col("text"), enStop).as("quality_score"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, lower(text) AS lt, lower(trim(text)) AS t,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(toks) AS INT) AS n_tokens_ws,
             |  CAST(len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_tokens_bpe,
             |  length(regexp_replace(lt, '[a-z0-9\s]', '', 'g')) / length(lt) AS punct_ratio,
             |  len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks) AS stopword_ratio,
             |  0.4::DOUBLE * (len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks))
             |      + 0.3::DOUBLE * least(1.0::DOUBLE, len(toks) / 100.0::DOUBLE)
             |      + 0.3::DOUBLE * (1.0::DOUBLE - length(regexp_replace(lt, '[a-z0-9\s]', '', 'g')) / length(lt)) AS quality_score
             |FROM d ORDER BY doc_id""".stripMargin)),

    // Language ID: stopword-token hits (x2) + characteristic char-trigram
    // hits per language, argmax with deterministic tie-break. The oracle
    // SQL is GENERATED from the same word/gram lists so both engines stay
    // in sync by construction.
    Q("q39_langid",
      (s, dir) => t(s, dir, "documents").select(
        Seq(col("doc_id")) ++
          TextOps.langStopwords.map { case (l, ws) =>
            TextOps.langHits(col("text"), ws).as(s"hits_$l")
          } ++
          TextOps.langTrigrams.map { case (l, gs) =>
            TextOps.langNgramHits(col("text"), gs).as(s"ngram_$l")
          } ++ Seq(TextOps.langId(col("text")).as("pred_lang")): _*)
        .orderBy("doc_id"),
      Some {
        def esc(x: String) = x.replace("'", "''")
        val hits = TextOps.langStopwords.map { case (l, ws) =>
          val list = ws.map(w => s"'${esc(w)}'").mkString(", ")
          s"CAST(len(list_filter(toks, x -> list_contains([$list], x))) AS INT) AS hits_$l"
        }.mkString(",\n  ")
        val ngrams = TextOps.langTrigrams.map { case (l, gs) =>
          gs.map(g =>
            s"CAST((length(t) - length(replace(t, '${esc(g)}', ''))) / ${g.length} AS INT)")
            .mkString("(", " + ", s") AS ngram_$l")
        }.mkString(",\n  ")
        val score = (l: String) => s"(hits_$l * 2 + ngram_$l)"
        s"""WITH d AS (
           |  SELECT doc_id, lower(trim(text)) AS t,
           |         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           |  FROM documents),
           |h AS (SELECT doc_id,
           |  $hits,
           |  $ngrams
           |  FROM d)
           |SELECT doc_id, hits_en, hits_es, hits_de, hits_fr,
           |       ngram_en, ngram_es, ngram_de, ngram_fr,
           |  CASE WHEN ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("de")} AND ${score("en")} >= ${score("fr")} THEN 'en'
           |       WHEN ${score("es")} >= ${score("de")} AND ${score("es")} >= ${score("fr")} THEN 'es'
           |       WHEN ${score("de")} >= ${score("fr")} THEN 'de'
           |       ELSE 'fr' END AS pred_lang
           |FROM h ORDER BY doc_id""".stripMargin
      }),

    // Document fingerprinting: whole-content md5 + winnowing rolling min-hash.
    Q("q40_fingerprint",
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprintMd5(col("text")).as("fp_md5"),
        TextOps.winnowFingerprint(col("text"), 8).as("winnow_fp"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents)
             |SELECT doc_id,
             |  md5(array_to_string(toks, ' ')) AS fp_md5,
             |  CASE WHEN len(toks) >= 8 THEN
             |    list_min(list_transform(range(1, len(toks)-6),
             |      i -> ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT))
             |  ELSE NULL END AS winnow_fp
             |FROM d ORDER BY doc_id""".stripMargin)),

    // Per-document n-gram repetition signals (Gopher top-n-gram coverage +
    // duplicated-n-gram fraction), computed INSIDE the row over the sorted
    // bigram array — zero shuffle (RepetitionSpec pins the no-Exchange
    // plan), unlike the explode+groupBy formulation the oracle uses, which
    // would shuffle every gram occurrence of the corpus. Fractions are
    // single int/int double divisions — bit-reproducible cross-engine.
    Q("q109_repetition_signals",
      (s, dir) => graft.text.Repetition
        .ngramStats(t(s, dir, "documents"), "doc_id", "text", 2)
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, u.g AS gram
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)),
             |       i -> array_to_string(d.toks[i:i+1], ' '))) u(g)
             |  WHERE len(d.toks) >= 2),
             |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
             |s AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS m,
             |             CAST(count(*) AS BIGINT) AS d_n,
             |             CAST(max(cnt) AS BIGINT) AS topn,
             |             CAST(coalesce(sum(cnt) FILTER (WHERE cnt >= 2), 0) AS BIGINT) AS dupn
             |      FROM c GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(m, 0) AS n_ngrams,
             |       coalesce(d_n, 0) AS distinct_ngrams,
             |       topn AS top_ngram_n, dupn AS dup_ngram_n,
             |       topn / m AS top_ngram_frac, dupn / m AS dup_ngram_frac
             |FROM d LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Corpus boilerplate profile: trigrams occurring in >= 5 distinct
    // documents are boilerplate; each doc reports its boilerplate-covered
    // occurrence count and fraction. The cross-document rule (C4's
    // "remove text seen many times across the corpus", over n-grams since
    // this corpus has no lines): only gram HASHES + doc ids shuffle, the
    // text never leaves the scan. minDocs = 5 is absolute, probed
    // non-trivial at every SF (186/151/25829 hot trigrams at
    // sf0.001/0.01/0.1).
    Q("q110_boilerplate_ngrams",
      (s, dir) => graft.text.Repetition
        .boilerplateProfile(t(s, dir, "documents"), "doc_id", "text", 3, 5)
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, u.g AS gram
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(g)
             |  WHERE len(d.toks) >= 3),
             |hot AS (SELECT gram FROM (
             |  SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
             |  WHERE nd >= 5),
             |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams
             |        FROM g GROUP BY doc_id),
             |b AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS boiler_n
             |      FROM g JOIN hot USING (gram) GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(n_ngrams, 0) AS n_ngrams,
             |       coalesce(b.boiler_n, 0) AS boiler_n,
             |       coalesce(b.boiler_n, 0) / n_ngrams AS boiler_frac
             |FROM d LEFT JOIN tot USING (doc_id) LEFT JOIN b USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Corpus heavy-hitter trigrams: the 50 most widespread n-grams with
    // document frequency and total occurrences — the curator-facing
    // report behind q110's per-doc scoring (WHAT is boilerplate, not just
    // how much each doc carries). Total tie-break (df desc, total desc,
    // gram asc) makes the LIMIT cut deterministic cross-engine; the
    // Spark top-k is a TakeOrderedAndProject (per-partition partial
    // top-k), never a global sort.
    Q("q119_top_ngrams",
      (s, dir) => graft.text.Repetition
        .topNgrams(t(s, dir, "documents"), "doc_id", "text", 3, 50),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, u.g AS gram
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(g)
             |  WHERE len(d.toks) >= 3),
             |c AS (SELECT doc_id, gram, count(*) AS cnt
             |      FROM g GROUP BY doc_id, gram)
             |SELECT gram AS ngram, count(*) AS df,
             |       CAST(sum(cnt) AS BIGINT) AS total_n
             |FROM c GROUP BY gram
             |ORDER BY df DESC, total_n DESC, ngram LIMIT 50""".stripMargin)),

    // Budget-constrained selection: keep the highest-quality docs until
    // half the corpus's tokens are spent — the "curate N tokens for
    // pretraining" op. Exact global running sum via score-range buckets +
    // broadcast offsets (Downsample.selectWithinBudget), never a global
    // window; the oracle replays it as the single ORDER BY window it
    // semantically is. quality_score doubles are bit-identical across
    // engines (q38); costs/cum/budget are all-integer, so the <= budget
    // cutoff is exact. Window SUM and the budget's SUM are CAST to
    // BIGINT (DuckDB widens to HUGEINT, the q114 lesson). The budget is
    // a one-row aggregate collected driver-side — the absolute-budget
    // API ("2e12 tokens") is the operator's; only this query derives it
    // from the corpus. The scored (id, score, cost) projection is
    // PERSISTED at query level so the budget aggregate, the operator's
    // quantile sketch, its offsets aggregate and its main pass all read
    // one materialization instead of four regex-scoring corpus scans
    // (operator persistIntermediate stays false — its filtered frame is
    // a subtree of this cache, and a second persist would double-store);
    // CacheManager matches the cached subtree across all four plans.
    Q("q120_budget_selection",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"),
          TextOps.qualityScore(col("text"), enStop).as("quality_score"),
          TextOps.tokenCountWs(col("text")).cast(LongType).as("n_tokens"))
          .where(col("quality_score").isNotNull)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val budget = d.agg(sum("n_tokens")).head().getLong(0) / 2
        graft.operators.Downsample.selectWithinBudget(
            d, "doc_id", "quality_score", "n_tokens", budget)
          .select("doc_id", "quality_score", "n_tokens", "sel_rank", "cum_cost")
          .orderBy("sel_rank")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, lower(text) AS lt,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE length(text) > 0),
             |scored AS (
             |  SELECT doc_id,
             |    0.4::DOUBLE * (len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks))
             |      + 0.3::DOUBLE * least(1.0::DOUBLE, len(toks) / 100.0::DOUBLE)
             |      + 0.3::DOUBLE * (1.0::DOUBLE - length(regexp_replace(lt, '[a-z0-9\s]', '', 'g')) / length(lt)) AS quality_score,
             |    CAST(len(toks) AS BIGINT) AS n_tokens
             |  FROM d),
             |ranked AS (
             |  SELECT doc_id, quality_score, n_tokens,
             |    CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS sel_rank,
             |    CAST(SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cost
             |  FROM scored),
             |b AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS budget FROM scored)
             |SELECT doc_id, quality_score, n_tokens, sel_rank, cum_cost
             |FROM ranked, b WHERE cum_cost <= budget
             |ORDER BY sel_rank""".stripMargin)),

    // Per-source proportional quality gate: keep the top 30% of every
    // source, best-first — capPerKey's fraction-shaped complement
    // (Downsample.topFractionPerKey). The quota is exact integer
    // basis-point arithmetic, ceil(n * 3000 / 10000), so both engines cut
    // at the identical rank; the operator ranks via (key, score-bucket)
    // windows + per-key offsets, the oracle as the single per-key window
    // it semantically is. quality_score doubles are bit-identical (q38).
    // persistIntermediate: the operator's three passes (sketch, offsets,
    // main) share one materialization of the regex-scored projection
    // instead of re-scoring the corpus per branch.
    Q("q122_top_fraction_per_source",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextOps.qualityScore(col("text"), enStop).as("quality_score"))
          .where(col("quality_score").isNotNull)
        graft.operators.Downsample.topFractionPerKey(
            d, "source", "doc_id", "quality_score", 3000,
            persistIntermediate = true)
          .select("source", "doc_id", "quality_score", "quality_rank")
          .orderBy("source", "doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lower(text) AS lt,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE length(text) > 0),
             |scored AS (
             |  SELECT doc_id, source,
             |    0.4::DOUBLE * (len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks))
             |      + 0.3::DOUBLE * least(1.0::DOUBLE, len(toks) / 100.0::DOUBLE)
             |      + 0.3::DOUBLE * (1.0::DOUBLE - length(regexp_replace(lt, '[a-z0-9\s]', '', 'g')) / length(lt)) AS quality_score
             |  FROM d),
             |ranked AS (
             |  SELECT source, doc_id, quality_score,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS quality_rank,
             |    count(*) OVER (PARTITION BY source) AS n
             |  FROM scored)
             |SELECT source, doc_id, quality_score, quality_rank
             |FROM ranked WHERE quality_rank <= (n * 3000 + 9999) // 10000
             |ORDER BY source, doc_id""".stripMargin)),

    // Corpus snapshot diff — dataset versioning's `git status` between two
    // corpus snapshots (Incremental.snapshotDiff): added/removed/changed/
    // unchanged by md5 content hash, full outer join on id, text never on
    // the wire. Old = corpus minus doc_id%11==3 (those become `added`);
    // new drops doc_id%17==2 (`removed`) and rewrites text for
    // doc_id%13==1 (`changed`). md5 agrees byte-for-byte across engines.
    Q("q123_snapshot_diff",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val oldSnap = docs.where(col("doc_id") % 11 =!= 3)
        val newSnap = docs.where(col("doc_id") % 17 =!= 2)
          .withColumn("text", when(col("doc_id") % 13 === 1,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.delta.Incremental.snapshotDiff(
            oldSnap, newSnap, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH o AS (
             |  SELECT doc_id, md5(text) AS h FROM documents
             |  WHERE doc_id % 11 <> 3),
             |n AS (
             |  SELECT doc_id,
             |         md5(CASE WHEN doc_id % 13 = 1 THEN text || ' v2'
             |                  ELSE text END) AS h
             |  FROM documents WHERE doc_id % 17 <> 2)
             |SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
             |       CASE WHEN o.doc_id IS NULL THEN 'added'
             |            WHEN n.doc_id IS NULL THEN 'removed'
             |            WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
             |            ELSE 'changed' END AS status
             |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Corpus TF-IDF: top-3 characteristic terms per document. The gated
    // score is ROUNDED to 6 decimals and the ranking runs on the rounded
    // value with a term tie-break: ln() differs by ulps between JVM libm
    // and DuckDB libm, so the raw double can never be hash-gated and a
    // raw-score ranking could flip near-ties across engines — the
    // rational parts (tf_count, doc_len, df) gate exactly. Window sums
    // CAST to BIGINT: DuckDB widens SUM(BIGINT) to HUGEINT, Spark stays
    // long.
    Q("q105_tfidf_terms",
      (s, dir) => graft.text.TfIdf
        .topTerms(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf_count
             |  FROM toks GROUP BY doc_id, term),
             |st AS (
             |  SELECT doc_id, term, tf_count,
             |         CAST(SUM(tf_count) OVER (PARTITION BY doc_id) AS BIGINT) AS doc_len,
             |         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             |         (SELECT count(*) FROM documents) AS n_docs
             |  FROM tf),
             |sc AS (
             |  SELECT doc_id, term, tf_count, doc_len, df,
             |         round((tf_count / CAST(doc_len AS DOUBLE)) *
             |               (ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) + 1), 6) AS tfidf_r6
             |  FROM st),
             |rk AS (
             |  SELECT doc_id, term, tf_count, doc_len, df, tfidf_r6,
             |         CAST(row_number() OVER (PARTITION BY doc_id
             |           ORDER BY tfidf_r6 DESC, term) AS INT) AS rank
             |  FROM sc)
             |SELECT doc_id, rank, term, tf_count, doc_len, df, tfidf_r6
             |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // BM25 relevance ranking against a fixed query-term set. Gated on
    // integer micro-unit scores: each (doc, term) contribution is
    // round(idf * tfn * 1e6) as BIGINT and the per-doc total is an exact
    // integer sum — a double sum would reintroduce FP-addition-order
    // divergence between engines even after per-term rounding. Double
    // literals (1.2, 2.2, 0.75...) are the same decimal text in both
    // engines, so they parse to identical doubles.
    Q("q106_bm25_rank",
      (s, dir) => graft.text.Bm25.rank(t(s, dir, "documents"),
        "doc_id", "text",
        Seq("spark", "join", "window", "stream"), 15),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS doc_len, toks FROM d),
             |stats AS (
             |  SELECT CAST(SUM(doc_len) AS BIGINT) AS len_sum,
             |         count(*) AS n_docs FROM base),
             |tf AS (
             |  SELECT doc_id, doc_len, term, count(*) AS tf
             |  FROM (SELECT doc_id, doc_len, unnest(toks) AS term FROM base)
             |  WHERE term IN ('spark', 'join', 'window', 'stream')
             |  GROUP BY doc_id, doc_len, term),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |sc AS (
             |  SELECT t.doc_id, t.doc_len,
             |    CAST(round(
             |      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) *
             |      ((t.tf * 2.2) /
             |       (t.tf + 1.2 * (0.25 + (0.75 * t.doc_len) /
             |                      (CAST(s.len_sum AS DOUBLE) / s.n_docs))))
             |      * 1000000.0) AS BIGINT) AS score_micro
             |  FROM tf t JOIN dft f USING (term) CROSS JOIN stats s),
             |agg AS (
             |  SELECT doc_id, doc_len, count(*) AS n_hit_terms,
             |         CAST(SUM(score_micro) AS BIGINT) AS score_micro
             |  FROM sc GROUP BY doc_id, doc_len)
             |SELECT doc_id, doc_len, n_hit_terms, score_micro,
             |       CAST(score_micro AS DOUBLE) / 1000000.0 AS score
             |FROM agg ORDER BY score_micro DESC, doc_id LIMIT 15""".stripMargin)),

    // Corpus-trained bigram-LM NLL (perplexity-proxy quality score).
    // Bigrams are built in the scan projection (zip_with over the token
    // array — DuckDB twin: list_transform over 1-based range), and the
    // gate rides the same integer micro-unit scheme as q106.
    Q("q107_bigram_lm_nll",
      (s, dir) => graft.text.NgramLm
        .bigramNll(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id,
             |         unnest(list_transform(range(1, len(toks)),
             |                               i -> toks[i] || ' ' || toks[i+1])) AS bigram
             |  FROM d WHERE len(toks) >= 2),
             |docbg AS (
             |  SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
             |bgc AS (
             |  SELECT bigram, CAST(SUM(tf) AS BIGINT) AS c_bg
             |  FROM docbg GROUP BY bigram),
             |uni AS (
             |  SELECT w1, count(*) AS c_w1
             |  FROM (SELECT unnest(toks) AS w1 FROM d) GROUP BY w1),
             |v AS (SELECT count(*) AS v_size FROM uni),
             |tok AS (
             |  SELECT b.doc_id, b.tf,
             |    CAST(round(-ln((c.c_bg + 1.0) / (u.c_w1 + v.v_size))
             |               * 1000000.0) AS BIGINT) * b.tf AS nll_micro
             |  FROM docbg b JOIN bgc c USING (bigram)
             |  JOIN uni u ON u.w1 = split_part(b.bigram, ' ', 1)
             |  CROSS JOIN v),
             |agg AS (
             |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
             |         CAST(SUM(nll_micro) AS BIGINT) AS nll_micro_sum
             |  FROM tok GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, nll_micro_sum,
             |       (CAST(nll_micro_sum AS DOUBLE) / n_bigrams) / 1000000.0 AS mean_nll
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance resampling: keep-probability proportional to
    // the doc's BM25 relevance weight (q106's micro-unit scores feed the
    // weight column). All-integer rate arithmetic + the md5 hash bucket,
    // so the oracle replays membership hash-for-hash — no FP anywhere.
    Q("q108_importance_resample",
      (s, dir) => {
        val w = graft.text.Bm25.termScores(t(s, dir, "documents"),
            "doc_id", "text", Seq("spark", "join", "window", "stream"))
          .groupBy("doc_id").agg(sum(col("score_micro")).as("w_micro"))
        graft.operators.Downsample.importanceSample(w, "doc_id", "w_micro")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS doc_len, toks FROM d),
             |stats AS (
             |  SELECT CAST(SUM(doc_len) AS BIGINT) AS len_sum,
             |         count(*) AS n_docs FROM base),
             |tf AS (
             |  SELECT doc_id, doc_len, term, count(*) AS tf
             |  FROM (SELECT doc_id, doc_len, unnest(toks) AS term FROM base)
             |  WHERE term IN ('spark', 'join', 'window', 'stream')
             |  GROUP BY doc_id, doc_len, term),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |sc AS (
             |  SELECT t.doc_id,
             |    CAST(round(
             |      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) *
             |      ((t.tf * 2.2) /
             |       (t.tf + 1.2 * (0.25 + (0.75 * t.doc_len) /
             |                      (CAST(s.len_sum AS DOUBLE) / s.n_docs))))
             |      * 1000000.0) AS BIGINT) AS score_micro
             |  FROM tf t JOIN dft f USING (term) CROSS JOIN stats s),
             |w AS (
             |  SELECT doc_id, CAST(SUM(score_micro) AS BIGINT) AS w_micro
             |  FROM sc GROUP BY doc_id),
             |mx AS (SELECT max(w_micro) AS max_w FROM w),
             |smp AS (
             |  SELECT w.doc_id, w.w_micro,
             |         (w.w_micro * 10000) // m.max_w AS rate_bp,
             |         ('0x'||substr(md5('imp#' || w.doc_id::VARCHAR),1,15))::BIGINT
             |           % 10000 AS bucket
             |  FROM w CROSS JOIN mx m)
             |SELECT doc_id, w_micro, rate_bp
             |FROM smp WHERE bucket < rate_bp ORDER BY doc_id""".stripMargin)),

    // ---- Multimodal columns -------------------------------------------

    // Binary media plumbing: opaque blob + typed metadata + deterministic
    // fake features (decode is a stub; see Multimodal.FakeDecoder).
    Q("q41_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.withMetadata(
          Multimodal.asBinaryMedia(t(s, dir, "documents"), "doc_id", "text"))
        def feat(j: Int) =
          ((TextOps.hash64(concat(col("content_md5"), lit(s"#f$j"))) % 1000)
            / lit(1000.0)).as(s"f$j")
        media.select(col("media_id"), col("kind"), col("n_bytes"),
          col("content_md5"), feat(0), feat(1), feat(2), feat(3))
          .orderBy("media_id")
      },
      Some {
        def feat(j: Int) =
          s"(('0x'||substr(md5(md5(text) || '#f$j'),1,15))::BIGINT % 1000) / CAST(1000 AS DOUBLE) AS f$j"
        s"""SELECT doc_id AS media_id,
           |  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  md5(text) AS content_md5,
           |  ${feat(0)}, ${feat(1)}, ${feat(2)}, ${feat(3)}
           |FROM documents ORDER BY media_id""".stripMargin
      }),

    // REAL image-header parsing (Multimodal.imageDims): width/height from
    // PNG IHDR fixed offsets and a bounded JPEG segment WALK (JFIF APP0 +
    // a variable-length id-derived COM segment precede the SOF0, so a
    // fixed-offset read sees garbage — the walk is load-bearing, not
    // decoration). Blobs are synthesized valid containers
    // (Multimodal.synthImageBytes — this container ships no image files);
    // the oracle replays BOTH sides in DuckDB: the same hex-concat
    // construction, PNG substr/conv arithmetic, and the segment walk as a
    // recursive CTE — so conv/substring/hex semantics are pinned
    // cross-engine, not just the end result. The CTE's `iter < 15`
    // (anchor row included -> 16 walk rows) matches the fold's
    // sequence(1, 16) exactly: both engines examine the same 16 marker
    // positions, so a 17th-marker SOF NULLs on both sides instead of
    // diverging. Expression-only: no UDF, no mapPartitions, blobs never
    // shuffle.
    Q("q125_image_header_dims",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthImageBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("png", "jpeg"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      // pmod via ((x % m) + m) % m — matches synthImageBytes' pmod so a
      // negative-id corpus builds the same bytes on both sides; TRY_CAST
      // in the walk/sof hex hops so a walk that runs off the string NULLs
      // (matching Spark's conv('') -> NULL) instead of erroring the oracle
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id AS media_id,
             |    CASE WHEN ((doc_id % 2) + 2) % 2 = 0 THEN
             |      '89504E470D0A1A0A' || '0000000D49484452' ||
             |      lpad(hex(16 + ((doc_id % 1024) + 1024) % 1024), 8, '0') ||
             |      lpad(hex(16 + (((doc_id * 7) % 768) + 768) % 768), 8, '0') ||
             |      '0806000000' ||
             |      substr(repeat(upper(md5(doc_id::VARCHAR)), 2), 1, 8)
             |    ELSE
             |      'FFD8' || 'FFE000104A46494600010100000100010000' ||
             |      'FFFE' || lpad(hex(((doc_id % 32) + 32) % 32 + 3), 4, '0') ||
             |      substr(repeat(upper(md5(doc_id::VARCHAR)), 2), 1,
             |             CAST((((doc_id % 32) + 32) % 32 + 1) * 2 AS INT)) ||
             |      'FFC00011' || '08' ||
             |      lpad(hex(16 + (((doc_id * 7) % 768) + 768) % 768), 4, '0') ||
             |      lpad(hex(16 + ((doc_id % 1024) + 1024) % 1024), 4, '0') ||
             |      '03012200021101031101' || 'FFD9'
             |    END AS hx
             |  FROM documents),
             |walk AS (
             |  SELECT media_id, hx, CAST(5 AS BIGINT) AS pos, 0 AS iter
             |  FROM d WHERE hx LIKE 'FFD8%'
             |  UNION ALL
             |  SELECT media_id, hx,
             |    CASE WHEN substr(hx, CAST(pos AS INT), 4) = 'FFFF'
             |         THEN pos + 2
             |         ELSE pos + 4 + 2 * TRY_CAST(('0x' ||
             |           substr(hx, CAST(pos AS INT) + 4, 4)) AS BIGINT)
             |    END, iter + 1
             |  FROM walk
             |  WHERE iter < 15
             |    AND substr(hx, CAST(pos AS INT), 4)
             |        NOT IN ('FFC0', 'FFC1', 'FFC2', 'FFC3', 'FFC5', 'FFC6',
             |                'FFC7', 'FFC9', 'FFCA', 'FFCB', 'FFCD', 'FFCE',
             |                'FFCF', 'FFD9')
             |    AND substr(hx, CAST(pos AS INT), 2) = 'FF'),
             |sof AS (
             |  SELECT media_id,
             |    TRY_CAST(('0x'||substr(hx, CAST(pos AS INT) + 10, 4)) AS BIGINT) AS h,
             |    TRY_CAST(('0x'||substr(hx, CAST(pos AS INT) + 14, 4)) AS BIGINT) AS w
             |  FROM walk
             |  WHERE substr(hx, CAST(pos AS INT), 4)
             |        IN ('FFC0', 'FFC1', 'FFC2', 'FFC3', 'FFC5', 'FFC6',
             |            'FFC7', 'FFC9', 'FFCA', 'FFCB', 'FFCD', 'FFCE',
             |            'FFCF'))
             |SELECT d.media_id,
             |  CASE WHEN hx LIKE '89504E470D0A1A0A%' THEN 'png'
             |       WHEN hx LIKE 'FFD8%' THEN 'jpeg' END AS format,
             |  CASE WHEN hx LIKE '89504E470D0A1A0A%'
             |       THEN CAST(('0x'||substr(hx, 33, 8)) AS BIGINT)
             |       ELSE sof.w END AS width,
             |  CASE WHEN hx LIKE '89504E470D0A1A0A%'
             |       THEN CAST(('0x'||substr(hx, 41, 8)) AS BIGINT)
             |       ELSE sof.h END AS height,
             |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes
             |FROM d LEFT JOIN sof USING (media_id)
             |ORDER BY media_id""".stripMargin)),

    // Web-format image headers (Multimodal.imageDims GIF/WebP branches):
    // GIF87a/GIF89a logical-screen dims (LITTLE-endian u16 — the format
    // whose endianness a PNG-shaped parser gets wrong), and all three
    // WebP first-chunk layouts — VP8 (gated on the 9D012A start code),
    // VP8L (14+14 bits packed LSB-first in a LE u32, stored minus-one),
    // VP8X (LE u24 canvas minus-one pair). Bytes are synthesized valid
    // containers (Multimodal.synthWebImageBytes, pmod(id,5) variant mix);
    // the oracle replays BOTH the construction (same hex concat, LE
    // byte-swaps spelled out) and the positional parse arithmetic in
    // DuckDB, so the byte-swap/packing semantics are pinned cross-engine.
    // Hand-assembled golden headers (independent of the generator) live
    // in TrainingDataSpec — a construct/parse-symmetric endianness bug
    // cannot cancel out there. Expression-only; blobs never shuffle.
    Q("q127_web_image_dims",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthWebImageBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("gif", "webp"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH d AS (
             |  SELECT doc_id AS media_id,
             |    16 + ((doc_id % 1024) + 1024) % 1024 AS w,
             |    16 + (((doc_id * 7) % 768) + 768) % 768 AS h,
             |    ((doc_id % 5) + 5) % 5 AS v,
             |    upper(md5(doc_id::VARCHAR)) AS fill
             |  FROM documents),
             |le AS (
             |  SELECT media_id, v, fill,
             |    substr(lpad(hex(w),4,'0'),3,2) || substr(lpad(hex(w),4,'0'),1,2) AS wle2,
             |    substr(lpad(hex(h),4,'0'),3,2) || substr(lpad(hex(h),4,'0'),1,2) AS hle2,
             |    substr(lpad(hex(w-1),6,'0'),5,2) || substr(lpad(hex(w-1),6,'0'),3,2)
             |      || substr(lpad(hex(w-1),6,'0'),1,2) AS wm1le3,
             |    substr(lpad(hex(h-1),6,'0'),5,2) || substr(lpad(hex(h-1),6,'0'),3,2)
             |      || substr(lpad(hex(h-1),6,'0'),1,2) AS hm1le3,
             |    substr(lpad(hex((w-1)+(h-1)*16384),8,'0'),7,2)
             |      || substr(lpad(hex((w-1)+(h-1)*16384),8,'0'),5,2)
             |      || substr(lpad(hex((w-1)+(h-1)*16384),8,'0'),3,2)
             |      || substr(lpad(hex((w-1)+(h-1)*16384),8,'0'),1,2) AS ble4
             |  FROM d),
             |enc AS (
             |  SELECT media_id,
             |    CASE v
             |      WHEN 0 THEN '474946383761' || wle2 || hle2 || '910000'
             |                  || substr(fill,1,16) || '3B'
             |      WHEN 2 THEN '474946383961' || wle2 || hle2 || '910000'
             |                  || substr(fill,1,16) || '3B'
             |      WHEN 1 THEN '52494646' || '1E000000' || '57454250'
             |                  || '56503820' || '12000000' || 'D00100'
             |                  || '9D012A' || wle2 || hle2 || substr(fill,1,16)
             |      WHEN 3 THEN '52494646' || '19000000' || '57454250'
             |                  || '5650384C' || '0D000000' || '2F' || ble4
             |                  || substr(fill,1,16)
             |      ELSE '52494646' || '16000000' || '57454250'
             |           || '56503858' || '0A000000' || '00' || '000000'
             |           || wm1le3 || hm1le3
             |    END AS hx
             |  FROM le),
             |p AS (
             |  SELECT media_id, hx,
             |    CASE WHEN hx LIKE '474946383761%' OR hx LIKE '474946383961%'
             |           THEN 'gif'
             |         WHEN hx LIKE '52494646%' AND substr(hx,17,8) = '57454250'
             |           THEN 'webp' END AS format,
             |    substr(hx,25,8) AS fourcc,
             |    TRY_CAST('0x'||substr(hx,49,2)||substr(hx,47,2)
             |             ||substr(hx,45,2)||substr(hx,43,2) AS BIGINT) AS b
             |  FROM enc)
             |SELECT media_id, format,
             |  CAST(CASE
             |    WHEN format = 'gif' AND length(hx) >= 20
             |      THEN TRY_CAST('0x'||substr(hx,15,2)||substr(hx,13,2) AS BIGINT)
             |    WHEN format = 'webp' AND fourcc = '56503820'
             |         AND length(hx) >= 60 AND substr(hx,47,6) = '9D012A'
             |      THEN TRY_CAST('0x'||substr(hx,55,2)||substr(hx,53,2) AS BIGINT) % 16384
             |    WHEN format = 'webp' AND fourcc = '5650384C'
             |         AND length(hx) >= 50 AND substr(hx,41,2) = '2F'
             |      THEN b % 16384 + 1
             |    WHEN format = 'webp' AND fourcc = '56503858' AND length(hx) >= 60
             |      THEN TRY_CAST('0x'||substr(hx,53,2)||substr(hx,51,2)
             |                    ||substr(hx,49,2) AS BIGINT) + 1
             |  END AS BIGINT) AS width,
             |  CAST(CASE
             |    WHEN format = 'gif' AND length(hx) >= 20
             |      THEN TRY_CAST('0x'||substr(hx,19,2)||substr(hx,17,2) AS BIGINT)
             |    WHEN format = 'webp' AND fourcc = '56503820'
             |         AND length(hx) >= 60 AND substr(hx,47,6) = '9D012A'
             |      THEN TRY_CAST('0x'||substr(hx,59,2)||substr(hx,57,2) AS BIGINT) % 16384
             |    WHEN format = 'webp' AND fourcc = '5650384C'
             |         AND length(hx) >= 50 AND substr(hx,41,2) = '2F'
             |      THEN (b // 16384) % 16384 + 1
             |    WHEN format = 'webp' AND fourcc = '56503858' AND length(hx) >= 60
             |      THEN TRY_CAST('0x'||substr(hx,59,2)||substr(hx,57,2)
             |                    ||substr(hx,55,2) AS BIGINT) + 1
             |  END AS BIGINT) AS height,
             |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes
             |FROM p ORDER BY media_id""".stripMargin)),

    // Desktop/legacy image headers (Multimodal.imageDims BMP/ICO
    // branches): BMP DIB layouts selected by the header's own size field
    // (12-byte CORE u16 dims vs 40+-byte INFO i32 dims), the top-down
    // NEGATIVE stored height emitted as magnitude, and ICO's
    // byte-sized dims where 0 means 256 (ids whose dim derives to 256
    // exercise the wrap in this bulk oracle). Bytes are synthesized valid
    // containers (Multimodal.synthBmpIcoBytes); the oracle recomputes
    // every field as GROUND-TRUTH id arithmetic; golden hand-assembled
    // headers in TrainingDataSpec pin the byte layout. Expression-only;
    // blobs never shuffle.
    Q("q130_bmp_ico_dims",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthBmpIcoBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("bmp", "ico"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    (((doc_id // 2) % 3) + 3) % 3 AS variant,
             |    16 + (((doc_id // 2) % 1024) + 1024) % 1024 AS bw,
             |    16 + (((doc_id // 2 * 7) % 768) + 768) % 768 AS bh,
             |    1 + (((doc_id // 2 * 51) % 256) + 256) % 256 AS iw,
             |    1 + (((doc_id // 2 * 29) % 256) + 256) % 256 AS ih
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  CASE WHEN pm2 = 0 THEN 'bmp' ELSE 'ico' END AS format,
             |  CAST(CASE WHEN pm2 = 0 THEN bw ELSE iw END AS BIGINT)
             |    AS width,
             |  CAST(CASE WHEN pm2 = 0 THEN bh ELSE ih END AS BIGINT)
             |    AS height,
             |  CAST(CASE WHEN pm2 = 1 THEN 38 WHEN variant = 2 THEN 34
             |       ELSE 62 END AS BIGINT) AS n_bytes
             |FROM m ORDER BY media_id""".stripMargin)),

    // TIFF first-IFD dims (Multimodal.imageDims TIFF branch): BOTH byte
    // orders ('II'/'MM' — every field including the IFD offset, entry
    // count, tags and values swaps with the header), an id-derived
    // filler gap before the IFD (offset-8 assumptions read garbage),
    // tag-sorted entries with an optional leading tag-254, and
    // SHORT-vs-LONG value types where a SHORT occupies the FIRST two
    // bytes of the value field in FILE order (a whole-u32 read on 'MM'
    // files yields width x 65536). Oracle is ground-truth id arithmetic;
    // goldens pin the byte layout. Expression-only; blobs never shuffle.
    Q("q132_tiff_dims",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthTiffBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("tiff"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    (((doc_id // 2) % 16) + 16) % 16 AS pad,
             |    (((doc_id // 2) % 2) + 2) % 2 AS extra,
             |    16 + (((doc_id // 2) % 1024) + 1024) % 1024 AS w,
             |    16 + (((doc_id // 2 * 7) % 768) + 768) % 768 AS h
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  'tiff' AS format,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(14 + pad + 12 * (2 + extra) AS BIGINT) AS n_bytes
             |FROM m ORDER BY media_id""".stripMargin)),

    // Audio/video container metadata (Multimodal.avMetadata): WAV chunk
    // walk (LIST before fmt, word-aligned hops) and MP4 box walk (free
    // before moov, descend into moov AND trak, mvhd + tkhd v0+v1 layouts
    // incl. 16.16 fixed-point video dims) — the metadata
    // side of the A/V family done with real byte parsing instead of the
    // labeled stub (decode stays stubbed: no codecs in this container).
    // Bytes are synthesized valid containers (Multimodal.synthAvBytes);
    // the oracle recomputes every field as GROUND-TRUTH id arithmetic —
    // deliberately NOT a parse replay, so it checks parse(synth(id)) ==
    // spec(id) end-to-end; the byte-layout independence (a symmetric
    // generator+parser endianness bug) is pinned by hand-assembled golden
    // headers in TrainingDataSpec, and cross-engine hex/conv semantics
    // are already pinned by q125/q127. Expression-only; blobs never
    // shuffle.
    Q("q128_av_header_meta",
      (s, dir) => Multimodal.avMetadata(
          Multimodal.synthAvBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("wav", "mp4"))
        .select(col("media_id"), col("av_format"), col("channels"),
          col("sample_rate"), col("bits_per_sample"),
          col("width"), col("height"), col("duration_ms"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    ((doc_id % 4) + 4) % 4 AS pm4,
             |    ((doc_id % 8) + 8) % 8 AS pm8,
             |    ((doc_id % 10) + 10) % 10 AS pm10,
             |    ((doc_id % 16) + 16) % 16 AS pm16,
             |    (((doc_id * 13) % 9000) + 9000) % 9000 AS pm13k,
             |    (((doc_id * 11) % 60000) + 60000) % 60000 AS pm11k,
             |    16 + ((doc_id % 1024) + 1024) % 1024 AS vw,
             |    16 + (((doc_id * 7) % 768) + 768) % 768 AS vh
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  CASE WHEN pm2 = 0 THEN 'wav' ELSE 'mp4' END AS av_format,
             |  CAST(CASE WHEN pm2 = 0 THEN
             |    CASE WHEN pm4 = 0 THEN 1 ELSE 2 END END AS BIGINT) AS channels,
             |  CAST(CASE WHEN pm2 = 0
             |    THEN 8000 + pm8 * 1000 END AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN pm2 = 0 THEN 16 END AS BIGINT) AS bits_per_sample,
             |  CAST(CASE WHEN pm2 = 1 THEN vw END AS BIGINT) AS width,
             |  CAST(CASE WHEN pm2 = 1 THEN vh END AS BIGINT) AS height,
             |  CAST(CASE WHEN pm2 = 0
             |    THEN (1000 + pm13k) * 1000 //
             |         ((8000 + pm8 * 1000) *
             |          (CASE WHEN pm4 = 0 THEN 1 ELSE 2 END) * 2)
             |    ELSE (3000 + pm11k) * 1000 // (600 + pm10 * 100)
             |  END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN pm2 = 0 THEN 60 + (pm8 + 1) * 2
             |       WHEN pm4 = 1 THEN 240 + pm16 + 1
             |       ELSE 264 + pm16 + 1 END AS BIGINT) AS n_bytes
             |FROM m ORDER BY media_id""".stripMargin)),

    // Compressed-audio container metadata (Multimodal.avMetadata MP3/FLAC
    // branches): the ID3v2 SYNCSAFE tag hop (sizes >= 128 split across
    // 7-bit bytes — a plain-u28 hop desyncs on most real tags), MPEG
    // version/bitrate/sample-rate table lookups, the whole-blob CBR
    // duration estimate, and FLAC's bit-packed STREAMINFO core read as a
    // u32 pair (the 36-bit total-samples split is exercised: its high
    // nibble is nonzero for most ids). Bytes are synthesized valid
    // containers (Multimodal.synthAudioBytes); the oracle recomputes
    // every field as GROUND-TRUTH id arithmetic — spec(id), not a parse
    // replay — and hand-assembled golden headers in TrainingDataSpec pin
    // the byte layout (syncsafe-malformed, reserved-index and truncation
    // NULL paths included). Expression-only; blobs never shuffle.
    Q("q129_audio_header_meta",
      (s, dir) => Multimodal.avMetadata(
          Multimodal.synthAudioBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("mp3", "flac"))
        .select(col("media_id"), col("av_format"), col("channels"),
          col("sample_rate"), col("bits_per_sample"), col("duration_ms"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    (((doc_id // 2) % 3) + 3) % 3 AS pm3,
             |    (((doc_id // 2) % 4) + 4) % 4 AS pm4,
             |    (((doc_id // 2) % 8) + 8) % 8 AS pm8,
             |    1 + (((doc_id // 2 * 3) % 300) + 300) % 300 AS tagsize,
             |    1 + (((doc_id // 2 * 5) % 14) + 14) % 14 AS bi,
             |    (((doc_id // 2 * 7) % 3) + 3) % 3 AS si,
             |    50 + (((doc_id // 2 * 13) % 200) + 200) % 200 AS audion,
             |    (((doc_id // 2 * 17) % 8) + 8) % 8 AS thi,
             |    100000 + (((doc_id // 2 * 13) % 1000000) + 1000000) % 1000000
             |      AS tlo
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, pm2, tagsize, bi, si, audion,
             |    CASE WHEN pm3 = 0 THEN 3 WHEN pm3 = 1 THEN 2 ELSE 0 END AS v,
             |    pm4 AS cm,
             |    8000 + pm8 * 1000 AS fsr, 1 + pm8 AS fch,
             |    8 + pm3 * 8 AS fbps,
             |    thi * 4294967296 + tlo AS ftotal
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CASE WHEN pm2 = 0 THEN 'mp3' ELSE 'flac' END AS av_format,
             |  CAST(CASE WHEN pm2 = 0 THEN CASE WHEN cm = 3 THEN 1 ELSE 2 END
             |       ELSE fch END AS BIGINT) AS channels,
             |  CAST(CASE WHEN pm2 = 0 THEN
             |      CASE WHEN v = 3 THEN ([44100,48000,32000])[CAST(si + 1 AS INT)]
             |           WHEN v = 2 THEN ([22050,24000,16000])[CAST(si + 1 AS INT)]
             |           ELSE ([11025,12000,8000])[CAST(si + 1 AS INT)] END
             |    ELSE fsr END AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN pm2 = 1 THEN fbps END AS BIGINT)
             |    AS bits_per_sample,
             |  CAST(CASE WHEN pm2 = 0 THEN
             |      ((4 + audion) * 8) // (CASE WHEN v = 3
             |        THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(bi AS INT)]
             |        ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[CAST(bi AS INT)] END)
             |    ELSE ftotal * 1000 // fsr END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN pm2 = 0 THEN 14 + tagsize + audion
             |       ELSE 42 END AS BIGINT) AS n_bytes
             |FROM f ORDER BY media_id""".stripMargin)),

    // Ogg container metadata (Multimodal.avMetadata Ogg branch): the
    // VARIABLE-length segment table before the first page's payload (a
    // fixed payload offset is only right for single-segment pages — the
    // synth cycles 1..3 lacing values), then codec selection by payload
    // prefix: OpusHead (channels u8, stored input rate u32 LE) vs
    // \\x01vorbis (channels u8, rate u32 LE). duration is NULL by
    // contract — it lives in the LAST page's granule position, which a
    // header parser cannot reach. Oracle recomputes all fields as
    // GROUND-TRUTH id arithmetic; golden headers in TrainingDataSpec pin
    // the byte layout. Expression-only; blobs never shuffle.
    Q("q131_ogg_header_meta",
      (s, dir) => Multimodal.avMetadata(
          Multimodal.synthOggBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("ogg"))
        .select(col("media_id"), col("av_format"), col("codec"),
          col("channels"), col("sample_rate"), col("duration_ms"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    1 + (((doc_id // 2) % 8) + 8) % 8 AS co,
             |    8000 + (((doc_id // 2) % 8) + 8) % 8 * 5000 AS sr,
             |    1 + (((doc_id // 2) % 3) + 3) % 3 AS nseg
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  'ogg' AS av_format,
             |  CASE WHEN pm2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
             |  CAST(co AS BIGINT) AS channels,
             |  CAST(sr AS BIGINT) AS sample_rate,
             |  CAST(NULL AS BIGINT) AS duration_ms,
             |  CAST(27 + nseg + CASE WHEN pm2 = 0 THEN 19 ELSE 30 END
             |    AS BIGINT) AS n_bytes
             |FROM m ORDER BY media_id""".stripMargin)),

    // EXIF orientation + display dims (Multimodal.imageDims orientation
    // path): the segment walk hops an APP1/Exif segment (recording its
    // embedded TIFF) AND a variable-length COM to reach the SOF, then a
    // second endian-paired IFD scan reads tag 274 — both 'II' and 'MM'
    // byte orders occur corpus-wide, all eight orientations each, and
    // orientations 5..8 swap the emitted dims to DISPLAY resolution (the
    // phone-portrait trap: coded landscape + orientation 6). Oracle is
    // ground-truth id arithmetic; goldens pin the byte layout.
    Q("q134_exif_orientation",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthExifJpegBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("jpeg"))
        .select(col("media_id"), col("format"), col("orientation"),
          col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    1 + (((doc_id // 2) % 8) + 8) % 8 AS orient,
             |    1 + (((doc_id // 2) % 32) + 32) % 32 AS comb,
             |    16 + ((doc_id % 1024) + 1024) % 1024 AS w,
             |    16 + (((doc_id * 7) % 768) + 768) % 768 AS h
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  'jpeg' AS format,
             |  CAST(orient AS BIGINT) AS orientation,
             |  CAST(CASE WHEN orient >= 5 THEN h ELSE w END AS BIGINT)
             |    AS width,
             |  CAST(CASE WHEN orient >= 5 THEN w ELSE h END AS BIGINT)
             |    AS height,
             |  CAST(63 + comb AS BIGINT) AS n_bytes
             |FROM m ORDER BY media_id""".stripMargin)),

    // AVIF/HEIC image dims (Multimodal.imageDims ispe branch): modern
    // web-crawl image containers are ISO-BMFF, so the dimensions live in
    // an `ispe` full-box nested meta > iprp > ipco — reachable only by a
    // box walk that DESCENDS into containers (plus a variable-length
    // `free` box, an `hdlr` decoy child and a `pixi` decoy property on
    // the way; fixed offsets read garbage at every step). Bytes are
    // synthesized valid containers (Multimodal.synthIsobmffBytes); the
    // oracle recomputes every field as GROUND-TRUTH id arithmetic —
    // spec(id), not a parse replay — and hand-assembled golden headers in
    // TrainingDataSpec pin the byte layout (mif1 brand, largesize hop,
    // truncation and non-image-brand NULL paths). Expression-only; blobs
    // never shuffle.
    Q("q135_isobmff_image_dims",
      (s, dir) => Multimodal.imageDims(
          Multimodal.synthIsobmffBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("avif", "heic", "heif"))
        .select(col("media_id"), col("format"), col("width"), col("height"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    doc_id // 2 AS hid
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, pm2,
             |    16 + ((hid % 1024) + 1024) % 1024 AS w,
             |    16 + (((hid * 7) % 768) + 768) % 768 AS h,
             |    1 + (((hid * 3) % 16) + 16) % 16 AS nfree,
             |    1 + (((hid * 5) % 16) + 16) % 16 AS nmdat
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CASE WHEN pm2 = 0 THEN 'avif' ELSE 'heic' END AS format,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(133 + nfree + nmdat AS BIGINT) AS n_bytes
             |FROM f ORDER BY media_id""".stripMargin)),

    // WebM/Matroska metadata (avMetadata EBML branch): video crawls are
    // WebM/MKV-heavy, and EBML is structurally unlike every other
    // container here — element IDs and sizes are VARINTS whose first
    // byte's leading-bit class encodes their length, floats are IEEE-754
    // decoded arithmetically, and the fields sit behind a six-deep
    // container descent (Segment > Info / Tracks > TrackEntry > Video/
    // Audio). Bytes are synthesized valid containers
    // (Multimodal.synthWebmBytes) varying every trap axis with the id
    // (Void decoy, 1-vs-2-byte size varints, f32-vs-f64 Duration,
    // default-vs-stored TimestampScale, known-vs-unknown Segment size);
    // the oracle recomputes every field and the byte length as
    // GROUND-TRUTH id arithmetic — spec(id), not a parse replay — and
    // hand-assembled golden headers in TrainingDataSpec pin the layout.
    // Expression-only; blobs never shuffle.
    Q("q136_webm_metadata",
      (s, dir) => Multimodal.avMetadata(
          Multimodal.synthWebmBytes(t(s, dir, "documents"), "doc_id"),
          formats = Set("webm", "mkv"))
        .select(col("media_id"), col("av_format"), col("codec"),
          col("channels"), col("sample_rate"), col("width"), col("height"),
          col("duration_ms"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    doc_id // 2 AS hid
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, pm2,
             |    16 + ((hid % 1024) + 1024) % 1024 AS w,
             |    16 + (((hid * 7) % 768) + 768) % 768 AS h,
             |    1 + ((hid % 8) + 8) % 8 AS ch,
             |    8000 + ((hid % 8) + 8) % 8 * 1000 AS sr,
             |    1000 + (((hid * 13) % 9000) + 9000) % 9000 AS dur,
             |    1 + (((hid * 3) % 16) + 16) % 16 AS nfv,
             |    1 + (((hid * 5) % 16) + 16) % 16 AS ncl,
             |    CASE WHEN ((hid % 3) + 3) % 3 <> 0 THEN 8 ELSE 0 END AS tsb,
             |    CASE WHEN ((hid % 2) + 2) % 2 = 1 THEN 11 ELSE 7 END AS durb,
             |    CASE WHEN ((hid % 4) + 4) % 4 = 1 THEN 2 ELSE 1 END AS iszb
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CASE WHEN pm2 = 0 THEN 'webm' ELSE 'mkv' END AS av_format,
             |  CASE WHEN pm2 = 0 THEN 'V_VP9' ELSE 'A_OPUS' END AS codec,
             |  CAST(CASE WHEN pm2 = 1 THEN ch END AS BIGINT) AS channels,
             |  CAST(CASE WHEN pm2 = 1 THEN sr END AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN pm2 = 0 THEN w END AS BIGINT) AS width,
             |  CAST(CASE WHEN pm2 = 0 THEN h END AS BIGINT) AS height,
             |  CAST(dur AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN pm2 = 0 THEN 12 ELSE 16 END
             |    + 12 + 2 + nfv + 4 + iszb + tsb + durb
             |    + CASE WHEN pm2 = 0 THEN 27 ELSE 29 END
             |    + 5 + ncl AS BIGINT) AS n_bytes
             |FROM f ORDER BY media_id""".stripMargin)),

    // Archive metadata (Multimodal.archiveMetadata): crawl-dump triage
    // BEFORE any decompress — which codec, how many member files, how big
    // uncompressed. Unlike the media parsers this one reads a bounded
    // TAIL window too: gzip's ISIZE trailer and ZIP's end-of-central-
    // directory (behind a variable-length archive comment, found by a
    // validated reverse search) live at EOF. Bytes are synthesized valid
    // archives (Multimodal.synthArchiveBytes: gzip/zip/zstd/xz/bz2, all
    // four zstd FCS widths, 1-4 ZIP members + id-derived comment); the
    // oracle recomputes every field and byte length as GROUND-TRUTH id
    // arithmetic, and hand-assembled golden bytes in TrainingDataSpec pin
    // the layouts incl. the fake-EOCD-in-comment NULL path.
    // Expression-only; blobs never shuffle.
    Q("q137_archive_metadata",
      (s, dir) => Multimodal.archiveMetadata(
          Multimodal.synthArchiveBytes(t(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("format"), col("detail"),
          col("n_entries"), col("uncompressed_size"), col("mtime_epoch"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 5) + 5) % 5 AS v,
             |    doc_id // 5 AS hid
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, v,
             |    1000 + (((hid * 13) % 9000) + 9000) % 9000 AS gzus,
             |    1600000000 + (((hid * 7) % 100000) + 100000) % 100000
             |      AS gzmt,
             |    1 + ((hid % 16) + 16) % 16 AS gznp,
             |    1 + ((hid % 4) + 4) % 4 AS zn,
             |    (((hid * 3) % 32) + 32) % 32 AS zclen,
             |    ((hid % 4) + 4) % 4 AS sub,
             |    ((hid % 256) + 256) % 256 AS zsus0,
             |    256 + ((hid % 60000) + 60000) % 60000 AS zsus1,
             |    70000 + (((hid * 11) % 1000000) + 1000000) % 1000000
             |      AS zsus2,
             |    1 + ((hid % 8) + 8) % 8 AS np8,
             |    ((hid % 3) + 3) % 3 AS xzc,
             |    1 + ((hid % 9) + 9) % 9 AS bzd,
             |    ((hid % 7) + 7) % 7 AS sk7,
             |    1 + ((hid % 6) + 6) % 6 AS skn
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CASE v WHEN 0 THEN 'gzip' WHEN 1 THEN 'zip'
             |         WHEN 2 THEN 'zstd' WHEN 3 THEN 'xz'
             |         ELSE 'bz2' END AS format,
             |  CASE WHEN v = 0 THEN 'deflate'
             |       WHEN v = 3 THEN CASE xzc WHEN 0 THEN 'crc32'
             |         WHEN 1 THEN 'crc64' ELSE 'sha256' END
             |       WHEN v = 4 THEN 'level-' || CAST(bzd AS VARCHAR)
             |  END AS detail,
             |  CAST(CASE WHEN v = 1 THEN zn END AS BIGINT) AS n_entries,
             |  CAST(CASE WHEN v = 0 THEN gzus
             |            WHEN v = 2 THEN
             |              CASE sub WHEN 0 THEN zsus0 WHEN 1 THEN zsus1
             |                WHEN 2 THEN zsus2 END
             |  END AS BIGINT) AS uncompressed_size,
             |  CAST(CASE WHEN v = 0 THEN gzmt END AS BIGINT) AS mtime_epoch,
             |  CAST(CASE v WHEN 0 THEN 18 + gznp
             |              WHEN 1 THEN 88 * zn + 22 + zclen
             |              WHEN 2 THEN (CASE sub WHEN 0 THEN 6 + np8
             |                WHEN 1 THEN 8 + np8 WHEN 2 THEN 9 + np8
             |                ELSE 6 + np8 END)
             |                + CASE WHEN sk7 = 3 THEN 8 + skn ELSE 0 END
             |              WHEN 3 THEN 8 + np8
             |              ELSE 4 + np8 END AS BIGINT) AS n_bytes
             |FROM f ORDER BY media_id""".stripMargin)),

    // URL canonicalization (UrlOps.canonicalizeUrls): the derivation
    // before exact-URL dedup — same page, different tracking params /
    // param order / case / default port / fragment must canonicalize
    // equal. Zero-UDF try_parse_url (ANSI parse_url THROWS on malformed
    // crawl URLs) + array HOFs; the oracle recomputes the canonical
    // STRING and every derived column as ground-truth id arithmetic.
    Q("q138_url_canonicalize",
      (s, dir) => UrlOps.canonicalizeUrls(
          UrlOps.synthUrls(t(s, dir, "documents"), "doc_id"))
        .select(col("url_id"), col("url_host"), col("url_port"),
          col("registrable_domain"), col("canonical_url"))
        .orderBy("url_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS m2,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 6) + 6) % 6 AS m6,
             |    ((doc_id % 7) + 7) % 7 AS m7,
             |    ((doc_id % 100) + 100) % 100 AS c100,
             |    ((doc_id % 50) + 50) % 50 AS c50,
             |    ((doc_id % 30) + 30) % 30 AS c30,
             |    ((doc_id % 9) + 9) % 9 AS m9
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m2, m6, m7, c50, c30, m9,
             |    CASE WHEN m2 = 0 THEN 'http' ELSE 'https' END AS sch,
             |    CASE m3 WHEN 0 THEN '' WHEN 1 THEN 'www.'
             |      ELSE 'a.b.' END AS sub,
             |    'site' || CAST(c100 AS VARCHAR) || '.' ||
             |      CASE m4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             |        WHEN 2 THEN 'co.uk' ELSE 'io' END AS dom
             |  FROM m)
             |SELECT doc_id AS url_id,
             |  sub || dom AS url_host,
             |  CAST(CASE WHEN m6 = 0 THEN 80 WHEN m6 = 1 THEN 8080 END
             |    AS BIGINT) AS url_port,
             |  dom AS registrable_domain,
             |  sch || '://' || sub || dom ||
             |    CASE WHEN m6 = 1 THEN ':8080'
             |         WHEN m6 = 0 AND m2 = 1 THEN ':80' ELSE '' END ||
             |    CASE WHEN m7 = 0 THEN '/'
             |         ELSE '/p' || CAST(c50 AS VARCHAR) ||
             |           CASE WHEN m9 = 4 THEN '%2F' ELSE '' END END ||
             |    '?a=1&q=' || CAST(c30 AS VARCHAR) AS canonical_url
             |FROM f ORDER BY url_id""".stripMargin)),

    // Per-domain crawl census over canonicalized URLs — the aggregate
    // capPerKey / topFractionPerKey key on: registrable domain, not raw
    // host, so www./m./regional subdomains pool into one budget. The
    // oracle replays the domain derivation and aggregates in SQL.
    Q("q139_domain_stats",
      (s, dir) => UrlOps.canonicalizeUrls(
          UrlOps.synthUrls(t(s, dir, "documents"), "doc_id"))
        .groupBy("registrable_domain")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("url_host")).as("n_hosts"),
          countDistinct(col("canonical_url")).as("n_pages"))
        .orderBy("registrable_domain"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS m2,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 6) + 6) % 6 AS m6,
             |    ((doc_id % 7) + 7) % 7 AS m7,
             |    ((doc_id % 100) + 100) % 100 AS c100,
             |    ((doc_id % 50) + 50) % 50 AS c50,
             |    ((doc_id % 30) + 30) % 30 AS c30,
             |    ((doc_id % 9) + 9) % 9 AS m9
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m2, m6, m7, c50, c30, m9,
             |    CASE WHEN m2 = 0 THEN 'http' ELSE 'https' END AS sch,
             |    CASE m3 WHEN 0 THEN '' WHEN 1 THEN 'www.'
             |      ELSE 'a.b.' END AS sub,
             |    'site' || CAST(c100 AS VARCHAR) || '.' ||
             |      CASE m4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             |        WHEN 2 THEN 'co.uk' ELSE 'io' END AS dom
             |  FROM m)
             |SELECT dom AS registrable_domain,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT sub || dom) AS BIGINT) AS n_hosts,
             |  CAST(count(DISTINCT sch || '://' || sub || dom ||
             |    CASE WHEN m6 = 1 THEN ':8080'
             |         WHEN m6 = 0 AND m2 = 1 THEN ':80' ELSE '' END ||
             |    CASE WHEN m7 = 0 THEN '/'
             |         ELSE '/p' || CAST(c50 AS VARCHAR) ||
             |           CASE WHEN m9 = 4 THEN '%2F' ELSE '' END END ||
             |    '?a=1&q=' || CAST(c30 AS VARCHAR)) AS BIGINT) AS n_pages
             |FROM f GROUP BY dom ORDER BY registrable_domain""".stripMargin)),

    // Media format census — the composed curation report: all nine synth
    // container families through BOTH header parsers, unioned, then a
    // per-format aggregate (count, exact width sum, exact duration sum —
    // sums, not avgs, so the cross-engine compare is integer-exact).
    // This is the query a crawl triage actually runs ("what formats and
    // how much of each do we hold?"), and any single-family parse
    // regression surfaces as a census delta pinpointing the format. The
    // oracle recomputes every aggregate from the families' id-arithmetic
    // ground truth — 16 formats, each a one-line spec(id) aggregate.
    // Scale shape: parsers are scan-side expressions; the only exchange
    // is the final per-format aggregate's.
    Q("q133_media_format_census",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // union the BYTE tables first, then parse ONCE per parser: the
        // parsers are row-wise, so union-then-parse equals
        // parse-then-union — but it puts 2 parser expressions in the
        // plan instead of 9, and optimizer cost scales with plan size
        // (measured r13: per-family parsing made the census 2.6x
        // slower, pure planning). It is also the honest corpus shape:
        // one media table through one parser, whatever the mix.
        // both census halves read their JVM mapPartitions rungs
        // (imageDimsFast / avMetadataFast — each parity-pinned against
        // its expression twin by ImageDimsFastSpec / AvFastSpec): the
        // interpreted header folds were the census's wall (r20, guide
        // §4). The per-family exhibit queries keep the expression
        // parsers — both stay oracle-checked.
        val img = Multimodal.imageDimsFast(Seq(
            Multimodal.synthImageBytes(d, "doc_id"),
            Multimodal.synthWebImageBytes(d, "doc_id"),
            Multimodal.synthBmpIcoBytes(d, "doc_id"),
            Multimodal.synthTiffBytes(d, "doc_id"),
            Multimodal.synthIsobmffBytes(d, "doc_id"))
            .reduce(_ unionByName _))
          .select(col("format"), col("width"),
            lit(null).cast(LongType).as("duration_ms"))
        // the A/V side goes through the JVM mapPartitions rung
        // (avMetadataFast — AvFastSpec pins it bit-compatible with the
        // expression parser): the interpreted chunk-walk folds were
        // ~0.1 ms/row and the census wall's dominant term (r20, guide
        // §4; CensusProbe A/B: av synth+meta noop 2.1-2.4 s -> 0.7 s).
        // The per-family exhibit queries (q128/q153/q158/q169) keep the
        // expression parser — both stay oracle-checked.
        val av = graft.multimodal.AvFast.avMetadataFast(Seq(
            Multimodal.synthAvBytes(d, "doc_id"),
            Multimodal.synthAudioBytes(d, "doc_id"),
            Multimodal.synthOggBytes(d, "doc_id"),
            Multimodal.synthWebmBytes(d, "doc_id"))
            .reduce(_ unionByName _))
          .select(col("av_format").as("format"), col("width"),
            col("duration_ms"))
        img.unionByName(av)
          .groupBy("format")
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("width"), lit(0L))).as("sum_w"),
            sum(coalesce(col("duration_ms"), lit(0L))).as("sum_dur"))
          .orderBy("format")
      },
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS pm2,
             |    ((doc_id % 5) + 5) % 5 AS pm5,
             |    ((doc_id % 4) + 4) % 4 AS pm4,
             |    ((doc_id % 8) + 8) % 8 AS pm8,
             |    ((doc_id % 10) + 10) % 10 AS pm10,
             |    (((doc_id * 13) % 9000) + 9000) % 9000 AS pm13k,
             |    (((doc_id * 11) % 60000) + 60000) % 60000 AS pm11k,
             |    16 + ((doc_id % 1024) + 1024) % 1024 AS iw,
             |    doc_id // 2 AS hid
             |  FROM documents),
             |f AS (
             |  SELECT b.*,
             |    16 + ((hid % 1024) + 1024) % 1024 AS hw,
             |    1 + (((hid * 51) % 256) + 256) % 256 AS icow,
             |    ((hid % 8) + 8) % 8 AS hm8,
             |    1 + (((hid * 5) % 14) + 14) % 14 AS bi,
             |    50 + (((hid * 13) % 200) + 200) % 200 AS audion,
             |    (((hid * 17) % 8) + 8) % 8 AS thi,
             |    100000 + (((hid * 13) % 1000000) + 1000000) % 1000000 AS tlo,
             |    1000 + (((hid * 13) % 9000) + 9000) % 9000 AS hdur,
             |    CASE WHEN ((hid % 3) + 3) % 3 = 0 THEN 3
             |         WHEN ((hid % 3) + 3) % 3 = 1 THEN 2 ELSE 0 END AS v
             |  FROM b)
             |SELECT format, CAST(n AS BIGINT) AS n,
             |       CAST(sum_w AS BIGINT) AS sum_w,
             |       CAST(sum_dur AS BIGINT) AS sum_dur
             |FROM (
             |  SELECT 'avif' AS format, count(*) AS n, SUM(hw) AS sum_w,
             |         0 AS sum_dur FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'bmp', count(*), SUM(hw), 0
             |    FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'heic', count(*), SUM(hw), 0
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'flac', count(*), 0,
             |    SUM((thi * 4294967296 + tlo) * 1000 // (8000 + hm8 * 1000))
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'gif', count(*), SUM(iw), 0
             |    FROM f WHERE pm5 IN (0, 2)
             |  UNION ALL SELECT 'ico', count(*), SUM(icow), 0
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'jpeg', count(*), SUM(iw), 0
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'mp3', count(*), 0,
             |    SUM(((4 + audion) * 8) // (CASE WHEN v = 3
             |      THEN ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(bi AS INT)]
             |      ELSE ([8,16,24,32,40,48,56,64,80,96,112,128,144,160])[CAST(bi AS INT)] END))
             |    FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'mkv', count(*), 0, SUM(hdur)
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'mp4', count(*), SUM(iw),
             |    SUM((3000 + pm11k) * 1000 // (600 + pm10 * 100))
             |    FROM f WHERE pm2 = 1
             |  UNION ALL SELECT 'ogg', count(*), 0, 0 FROM f
             |  UNION ALL SELECT 'webm', count(*), SUM(hw), SUM(hdur)
             |    FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'png', count(*), SUM(iw), 0
             |    FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'tiff', count(*), SUM(hw), 0 FROM f
             |  UNION ALL SELECT 'wav', count(*), 0,
             |    SUM((1000 + pm13k) * 1000 // ((8000 + pm8 * 1000) *
             |      (CASE WHEN pm4 = 0 THEN 1 ELSE 2 END) * 2))
             |    FROM f WHERE pm2 = 0
             |  UNION ALL SELECT 'webp', count(*), SUM(iw), 0
             |    FROM f WHERE pm5 IN (1, 3, 4)
             |) ORDER BY format""".stripMargin)),

    // ---- Events: streaming-shaped batch ops ---------------------------

    // Hourly windowed aggregation (batch form of the streaming window agg;
    // see graft.streaming.EventStreams for the readStream equivalent).
    Q("q42_events_hourly",
      (s, dir) => Sources.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          decStr(sum(col("value").cast(dec))).as("sum_value"))
        .orderBy("hour_ts", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             |       count(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS sum_value
             |FROM events GROUP BY date_trunc('hour', ts), event_type
             |ORDER BY hour_ts, event_type""".stripMargin)),

    // Gap-based sessionization (30-min inactivity): the batch twin of
    // mapGroupsWithState session windows.
    Q("q43_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prevUs = unix_micros(lag(col("ts"), 1).over(w))
        Sources.events(s, dir)
          .withColumn("is_new",
            when(prevUs.isNull ||
              unix_micros(col("ts")) - prevUs > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("is_new")).over(run))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            decStr(sum(col("value").cast(dec))).as("sum_value"),
            min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS sum_value,
             |       min(ts) AS start_ts, max(ts) AS end_ts
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // Native session windows: Spark's session_window() merges events into
    // gap-bounded sessions inside the aggregation itself — no explicit
    // lag/running-sum plumbing (q43 is the manual twin; also the shape
    // streaming session aggregation uses). Boundary semantics differ from
    // q43 by one edge: session_window starts a NEW session at gap == 30min
    // (next < prev + gap merges), the manual version only at gap > 30min —
    // the oracle encodes >=.
    Q("q86_session_window",
      (s, dir) => Sources.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          decStr(sum(col("value").cast(dec))).as("sum_value"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .select(col("user_id"), col("n_events"), col("sum_value"),
          col("start_ts"), col("end_ts"))
        .orderBy("user_id", "start_ts"),
      Some("""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS sum_value,
             |       min(ts) AS start_ts, max(ts) AS end_ts
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, start_ts""".stripMargin)),

    // Skew-safe salted aggregation: pre-aggregate on (key, salt), then
    // merge — equals the plain GROUP BY (the oracle) by construction.
    Q("q44_salted_agg",
      (s, dir) => Sources.events(s, dir)
        .groupBy(col("event_type"), pmod(col("event_id"), lit(8)).as("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(dec)).as("psum"))
        .groupBy("event_type")
        .agg(sum(col("pn")).as("n"), decStr(sum(col("psum"))).as("sum_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Repetition quality signals (Gopher/C4-style filters): distinct-token
    // ratio + dominant-token share. One explode + two-level agg.
    Q("q64_repetition_signals",
      (s, dir) => {
        val base = t(s, dir, "documents").select(col("doc_id"),
          TextOps.tokens(col("text")).as("toks"))
        val stats = base.select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
        val topTok = base.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max(col("c")).as("top_tok_n"))
        stats.join(topTok, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            (col("n_distinct") / col("n_tokens")).as("distinct_ratio"),
            col("top_tok_n"),
            (col("top_tok_n") / col("n_tokens")).as("top_tok_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |stats AS (
             |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
             |         CAST(len(list_distinct(toks)) AS INT) AS n_distinct
             |  FROM d),
             |top AS (
             |  SELECT doc_id, max(c) AS top_tok_n FROM (
             |    SELECT doc_id, tok, count(*) AS c
             |    FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
             |    GROUP BY doc_id, tok)
             |  GROUP BY doc_id)
             |SELECT s.doc_id, s.n_tokens, s.n_distinct,
             |       s.n_distinct / s.n_tokens AS distinct_ratio,
             |       t.top_tok_n,
             |       t.top_tok_n / s.n_tokens AS top_tok_ratio
             |FROM stats s JOIN top t ON s.doc_id = t.doc_id
             |ORDER BY s.doc_id""".stripMargin)),

    // Time-series resample: per-user hourly grid with linear interpolation
    // between nearest observations (operators.Resample — union + one keyed
    // sort + two IGNORE NULLS windows; an as-of join in both directions).
    Q("q74_resample_interp",
      (s, dir) => graft.operators.Resample.hourlyLinear(
        Sources.events(s, dir).where(col("user_id") < 8),
        "user_id", "ts", "value")
        .orderBy("user_id", "grid_ts"),
      Some("""WITH g AS (
             |  SELECT user_id,
             |         unnest(generate_series(date_trunc('hour', min(ts)),
             |                date_trunc('hour', max(ts)), INTERVAL 1 HOUR)) AS ts,
             |         1 AS is_grid, CAST(NULL AS DOUBLE) AS v
             |  FROM events WHERE user_id < 8 GROUP BY user_id),
             |o AS (SELECT user_id, ts, 0 AS is_grid, value AS v
             |      FROM events WHERE user_id < 8),
             |u AS (SELECT * FROM g UNION ALL SELECT * FROM o),
             |n AS (SELECT user_id, ts, is_grid, epoch_us(ts) AS us,
             |  last_value(v IGNORE NULLS) OVER wb AS pv,
             |  last_value(CASE WHEN is_grid = 0 AND v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER wb AS pt,
             |  first_value(v IGNORE NULLS) OVER wf AS nv,
             |  first_value(CASE WHEN is_grid = 0 AND v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER wf AS nt
             |  FROM u
             |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_grid, v
             |                ROWS UNBOUNDED PRECEDING),
             |         wf AS (PARTITION BY user_id ORDER BY ts, is_grid, v
             |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, ts AS grid_ts,
             |  CASE WHEN pt IS NULL THEN nv
             |       WHEN nt IS NULL THEN pv
             |       ELSE pv + (nv - pv) * (us - pt) / (nt - pt) END AS value_interp
             |FROM n WHERE is_grid = 1 ORDER BY user_id, grid_ts""".stripMargin)),

    // Text normalization battery: tokenize, strip stopwords, collapse
    // adjacent repeated tokens (boilerplate de-repetition), rejoin — with
    // per-stage token counts. Pure map-side HOF lambdas, no shuffle.
    Q("q75_text_normalize",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n_raw"),
          TextOps.removeStopwords(col("toks"), enStop :+ "a").as("kept"))
        .select(col("doc_id"), col("n_raw"), size(col("kept")).as("n_stop"),
          TextOps.collapseAdjacent(col("kept")).as("collapsed"))
        .select(col("doc_id"), col("n_raw"), col("n_stop"),
          size(col("collapsed")).as("n_norm"),
          concat_ws(" ", col("collapsed")).as("norm_text"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, CAST(len(toks) AS INT) AS n_raw,
             |    list_filter(toks,
             |      x -> NOT list_contains(['the','and','of','to','in','a'], x)) AS kept
             |  FROM t),
             |c AS (
             |  SELECT doc_id, n_raw, CAST(len(kept) AS INT) AS n_stop,
             |    list_filter(kept, (x, i) -> i = 1 OR x != kept[i-1]) AS collapsed
             |  FROM k)
             |SELECT doc_id, n_raw, n_stop, CAST(len(collapsed) AS INT) AS n_norm,
             |  array_to_string(collapsed, ' ') AS norm_text
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Per-domain cap (deterministic reservoir): at most 12 docs per source,
    // selected by stable content-hash order — reproducible downsampling.
    Q("q76_domain_cap",
      (s, dir) => graft.operators.Downsample
        .capPerKey(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", 12)
        .orderBy("source", "sample_rank"),
      Some("""WITH h AS (
             |  SELECT doc_id, source,
             |    ('0x'||substr(md5('cap#' || doc_id::VARCHAR),1,15))::BIGINT AS hv
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id)
             |         AS INT) AS sample_rank
             |  FROM h)
             |SELECT doc_id, source, sample_rank FROM r
             |WHERE sample_rank <= 12 ORDER BY source, sample_rank""".stripMargin)),

    // Int8-style uniform scalar quantization of embeddings: per-vector
    // [min,max] range to 256 integer codes. Exact integer output — the
    // engine-portable core of a 4x embedding-storage compression.
    Q("q77_embedding_quantize",
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        array_min(col("embedding")).cast(DoubleType).as("lo"),
        array_max(col("embedding")).cast(DoubleType).as("hi"),
        // joined to one string: the verify compare hashes scalar cells only
        concat_ws(",", Similarity.quantizeUniform(col("embedding"))).as("codes"))
        .orderBy("vec_id"),
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |r AS (
             |  SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e)
             |SELECT vec_id, lo, hi,
             |  array_to_string(CASE WHEN hi > lo THEN list_transform(v,
             |    x -> CAST(least(255, floor((x - lo) / ((hi - lo) / 255.0))) AS BIGINT))
             |  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END, ',') AS codes
             |FROM r ORDER BY vec_id""".stripMargin)),

    // Sliding event-time windows (1h length, 15m slide): each event lands
    // in exactly 4 overlapping windows. The oracle replicates Spark's
    // window() by cross-joining each event's 15-min bucket with offsets
    // 0..3. One shuffle on the window key; the streaming twin is
    // EventStreams.slidingCounts.
    Q("q81_sliding_window",
      (s, dir) => Sources.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"),
          decStr(sum(col("value").cast(dec))).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy("w_start"),
      Some("""WITH b AS (
             |  SELECT epoch_us(ts) // 900000000 AS bucket, value FROM events),
             |w AS (
             |  SELECT make_timestamp((b.bucket - k.k) * 900000000) AS w_start, value
             |  FROM b CROSS JOIN (VALUES (0),(1),(2),(3)) k(k))
             |SELECT w_start, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(38,4))) AS VARCHAR) AS sum_value
             |FROM w GROUP BY 1 ORDER BY w_start""".stripMargin)),

    // Approximate aggregates (HLL++ distinct count, approximate median).
    // Sketch ESTIMATES are engine-specific by design, so the raw numbers
    // can never hash-match DuckDB — instead the query outputs the exact
    // sides (n, exact distinct count) plus accuracy VERDICTS: booleans
    // asserting the deterministic sketch result lands inside its bound
    // (HLL++ at rsd 0.02 within 5% of exact — 2.5 sigma; measured error
    // <=0.4% at sf0.001/0.01/0.1, while the DEFAULT rsd 0.05 sketch
    // actually misses 5% at sf0.1: 6.7% error on 1500 users — the boolean
    // gate caught it. Approx median within the exact p25..p75: the band
    // was p40..p60, but percentile_approx's estimate depends on sketch
    // merge order, i.e. on partitioning — a near-edge estimate could flip
    // the verdict hash under a different partition layout. The wider band
    // plus accuracy=10000 (rank error ~n/10000, orders of magnitude inside
    // the band at any bench sf) makes the verdict partition-independent
    // while still catching a broken sketch.) The
    // oracle predicts the exact
    // columns and literal `true` for the verdicts — a sketch regression
    // flips a boolean and fails the hash gate. SketchSpec asserts the same
    // bounds with visibility into the raw estimates.
    Q("q82_approx_agg",
      (s, dir) => Sources.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("am"),
          percentile(col("value"), lit(0.25)).as("p25"),
          percentile(col("value"), lit(0.75)).as("p75"))
        .select(col("event_type"), col("n"), col("exact_users"),
          (abs(col("au") - col("exact_users"))
            <= col("exact_users") * 0.05).as("approx_users_ok"),
          col("am").between(col("p25"), col("p75")).as("approx_median_ok"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS exact_users,
             |  true AS approx_users_ok,
             |  true AS approx_median_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Concat-and-chunk sequence packing (operators.Packing): where every
    // document's tokens land in the fixed-budget training-sequence stream
    // of its hash shard — seq index, offset, sequences spanned. n_chars
    // stands in for the token count (same arithmetic, oracle-stable).
    Q("q92_sequence_packing",
      (s, dir) => graft.operators.Packing.packSequences(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", 2048L, 8)
        .orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id, n_chars,
             |    ('0x'||substr(md5('pack#' || doc_id::VARCHAR),1,15))::BIGINT AS hv
             |  FROM documents),
             |s AS (SELECT doc_id, n_chars, hv, hv % 8 AS shard FROM h),
             |r AS (SELECT doc_id, n_chars, shard,
             |  CAST(coalesce(SUM(n_chars) OVER (PARTITION BY shard ORDER BY hv, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
             |  FROM s)
             |SELECT doc_id, n_chars, shard,
             |  st // 2048 AS seq_idx,
             |  st % 2048 AS seq_offset,
             |  greatest(1, (st + n_chars - 1) // 2048 - st // 2048 + 1) AS n_spanned
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Deterministic global shuffle (operators.Packing): a reproducible
    // random total order + round-robin shard assignment for training-data
    // layout. NOT a global row_number window on the Spark side — a range
    // exchange orders partitions, each sorts locally, and the dense rank
    // is partition offset + local position (factSurrogateKey's two-pass
    // offset pattern); the md5 sort key makes any doc's position
    // re-derivable from (seed, id) by any engine.
    Q("q118_deterministic_shuffle",
      (s, dir) => graft.operators.Packing.deterministicShuffle(
        t(s, dir, "documents").select("doc_id"), "doc_id", "graft-epoch0", 8)
        .orderBy("doc_id"),
      Some("""WITH r AS (
             |  SELECT doc_id,
             |    row_number() OVER (
             |      ORDER BY md5('graft-epoch0:' || doc_id::VARCHAR), doc_id)
             |      - 1 AS shuffle_rank
             |  FROM documents)
             |SELECT doc_id, shuffle_rank, shuffle_rank % 8 AS shard_id
             |FROM r ORDER BY doc_id""".stripMargin)),

    // PII scrub: count + redact emails/phones/IPv4 to typed placeholders
    // (map-side regexes kept to the construct subset where java.util.regex
    // and RE2 agree). Deterministic synthetic PII is appended to every doc
    // so the redaction path is exercised on all rows.
    Q("q93_pii_redact",
      (s, dir) => {
        val doc = concat(col("text"),
          lit(" contact "), col("source"), lit("_user"),
          pmod(col("doc_id"), lit(97L)).cast(StringType),
          lit("@example.com now 555-"),
          lpad(pmod(col("doc_id"), lit(1000L)).cast(StringType), 3, "0"),
          lit("-0199 from 10.0."),
          pmod(col("doc_id"), lit(256L)).cast(StringType), lit(".77"))
        t(s, dir, "documents").select(
          col("doc_id"),
          TextOps.piiCount(doc, TextOps.emailPattern).as("n_emails"),
          TextOps.piiCount(doc, TextOps.phonePattern).as("n_phones"),
          TextOps.piiCount(doc, TextOps.ipv4Pattern).as("n_ips"),
          TextOps.redactPii(doc).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    lower(text || ' contact ' || source || '_user' ||
             |      (doc_id % 97)::VARCHAR || '@example.com now 555-' ||
             |      lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199 from 10.0.' ||
             |      (doc_id % 256)::VARCHAR || '.77') AS doc
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(doc, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(doc, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INT) AS n_phones,
             |  CAST(len(regexp_extract_all(doc, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(doc, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             |      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g'),
             |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
             |FROM d ORDER BY doc_id""".stripMargin)),

    // Blocked fuzzy matching: customer names paired inside all-but-last-
    // two-chars prefix blocks, edit distance <= 1 (entity resolution — the
    // blocking key bounds the quadratic stage like LSH bounds MinHash).
    Q("q88_fuzzy_match",
      (s, dir) => Dedup.fuzzyPairs(
        t(s, dir, "customer").where(col("c_custkey") < 3000),
        "c_custkey", "c_name",
        expr("substring(c_name, 1, length(c_name) - 2)"), maxDist = 1)
        .orderBy("id_a", "id_b"),
      Some("""WITH c AS (
             |  SELECT c_custkey AS id, c_name AS name,
             |         substring(c_name, 1, length(c_name) - 2) AS block
             |  FROM customer WHERE c_custkey < 3000)
             |SELECT a.id AS id_a, b.id AS id_b,
             |       CAST(levenshtein(a.name, b.name) AS INT) AS dist
             |FROM c a JOIN c b ON a.block = b.block AND a.id < b.id
             |WHERE levenshtein(a.name, b.name) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // The full corpus-curation funnel as ONE declarative plan: quality
    // threshold -> exact dedup (keep lowest id per content hash) -> per-
    // domain cap -> deterministic split -> per-(lang, split) accounting.
    // Stage 0 of the real-crawl version is UnicodeOps.normalizeText
    // (NFC + mojibake repair BEFORE any hashing — wired and timed in
    // CurationBench; omitted here because this corpus is clean ASCII and
    // q142 pins the clean-input no-op, so the oracle can stay a pure
    // DuckDB replay).
    // Catalyst pipelines the whole funnel; only the dedup/cap window
    // group-limits and the final agg shuffle. This is the shape of a
    // production 100 TB
    // curation job (each stage already oracle-checked alone: q38/q30/q76/
    // q68).
    Q("q85_curation_funnel",
      (s, dir) => {
        // project text down to its 16-byte fingerprint BEFORE the dedup
        // shuffle (q30's rule: the wire carries hashes, never documents)
        val docs = t(s, dir, "documents")
          .where(TextOps.qualityScore(col("text"), enStop) > 0.5)
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
            md5(col("text")).as("fp"))
        // keeper per content hash via rank-1 window: Spark's
        // InferWindowGroupLimit pre-prunes to one row per fp inside each
        // map partition BEFORE the shuffle (paired WindowGroupLimit), so a
        // duplicate-heavy fp never concentrates its group in one task and
        // the wire carries at most one row per (fp, map partition). The
        // groupBy(fp).agg(min(struct(...))) alternative moves the same
        // bytes but drops out of whole-stage codegen (struct buffers force
        // SortAggregate) — measured ~1.5x slower on this funnel at sf0.1.
        // See SCALING.md "Top-k-per-key: window vs aggregate (measured)".
        val dedupW = Window.partitionBy("fp").orderBy("doc_id")
        val deduped = docs.withColumn("rn", row_number().over(dedupW))
          .where(col("rn") === 1).drop("rn", "fp")
        val capped = graft.operators.Downsample
          .capPerKey(deduped, "source", "doc_id", 20)
        capped
          .withColumn("split",
            graft.operators.Downsample.splitLabel(col("doc_id")))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang", "split")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, lang, n_chars, text,
             |         lower(text) AS lraw,
             |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, source, lang, n_chars, text FROM d
             |  WHERE 0.4::DOUBLE * (len(list_filter(toks, x -> list_contains(['the','and','of','to','in'], x))) / len(toks))
             |      + 0.3::DOUBLE * least(1.0::DOUBLE, len(toks) / 100.0::DOUBLE)
             |      + 0.3::DOUBLE * (1.0::DOUBLE - length(regexp_replace(lraw, '[a-z0-9\s]', '', 'g')) / length(lraw)) > 0.5),
             |dd AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |    FROM q) WHERE rn = 1),
             |cap AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY source
             |      ORDER BY ('0x'||substr(md5('cap#' || doc_id::VARCHAR),1,15))::BIGINT, doc_id) AS cr
             |    FROM dd) WHERE cr <= 20),
             |sp AS (
             |  SELECT lang, n_chars,
             |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM (SELECT *,
             |    ('0x'||substr(md5('split#' || doc_id::VARCHAR),1,15))::BIGINT % 100 AS b
             |    FROM cap))
             |SELECT lang, split, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM sp GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // Token-id encoding against a learned frequency vocab — the tokenizer-
    // apply step of a pretraining pipeline: vocab = top-20 tokens by
    // (freq desc, token), OOV -> -1. The cap is 20, BELOW the corpus's 31
    // distinct tokens, precisely so the OOV branch actually fires and is
    // oracle-checked (a top-1000 vocab would swallow the whole alphabet
    // and leave the -1 path dead). The vocab is dimension-sized and
    // broadcasts; the explode/join/re-gather keeps token order via the
    // (pos, tid) struct sort. Output rides as a comma string (the verify
    // compare hashes scalar cells).
    Q("q95_token_ids",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        val freq = d.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
        val vocab = graft.ops.ColumnOps.withSurrogateKey(
          freq.orderBy(col("n").desc, col("tok")).limit(20),
          "tid", col("n").desc, col("tok"))
        val pos = d.select(col("doc_id"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        pos.join(broadcast(vocab.select("tok", "tid")), Seq("tok"), "left")
          .withColumn("tid", coalesce(col("tid"), lit(-1L)))
          .groupBy("doc_id")
          .agg(
            concat_ws(",", transform(
              array_sort(collect_list(struct(col("pos"), col("tid")))),
              p => p.getField("tid").cast(StringType))).as("ids"),
            sum(when(col("tid") === -1L, 1L).otherwise(0L)).as("n_oov"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |freq AS (
             |  SELECT tok, count(*) AS n
             |  FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok),
             |vocab AS (
             |  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS tid
             |  FROM (SELECT * FROM freq ORDER BY n DESC, tok LIMIT 20)),
             |pos AS (
             |  SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i AS INT)] AS tok
             |  FROM d CROSS JOIN unnest(range(1, len(d.toks) + 1)) r(i)),
             |enc AS (
             |  SELECT p.doc_id, p.pos, coalesce(v.tid, -1) AS tid
             |  FROM pos p LEFT JOIN vocab v ON v.tok = p.tok)
             |SELECT doc_id,
             |  string_agg(tid::VARCHAR, ',' ORDER BY pos) AS ids,
             |  CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
             |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Overlapping context-window chunking (RAG indexing layout): 32-token
    // chunks on a 24-token stride — chunk k covers tokens [24k, 24k+32).
    // Pure map-side: sequence+explode per doc, slice per chunk; no shuffle
    // anywhere, scan-speed at 100 TB.
    Q("q96_context_chunks",
      (s, dir) => {
        val C = 32
        val S = 24
        t(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          .withColumn("n", size(col("toks")))
          .select(col("doc_id"), col("toks"), col("n"),
            explode(sequence(lit(0), expr(s"(n - 1) div $S"))).as("k"))
          .select(col("doc_id"), col("k").cast(IntegerType).as("chunk_idx"),
            concat_ws(" ",
              slice(col("toks"), col("k") * S + 1,
                least(lit(C), col("n") - col("k") * S))).as("chunk"),
            least(lit(C), col("n") - col("k") * S).cast(IntegerType)
              .as("n_chunk_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents)
             |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
             |  array_to_string(toks[CAST(k*24+1 AS INT):CAST(least(k*24+32, len(toks)) AS INT)], ' ') AS chunk,
             |  CAST(least(32, len(toks) - k*24) AS INT) AS n_chunk_tokens
             |FROM d CROSS JOIN unnest(range(0, (len(d.toks) - 1) // 24 + 1)) r(k)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Corpus mixing: deterministic per-source sampling weights (the LLM
    // data-mixing step — "3 parts web, 1 part forums, all of wiki"). The
    // hash-bucket predicate is engine-portable, so the oracle applies the
    // SAME membership function; per-(source, kept) accounting shows the
    // realized rates. Sources not in the mix drop to 0.
    Q("q99_corpus_mix",
      (s, dir) => {
        val mix = Map("src0" -> 10000, "src1" -> 8000, "src2" -> 5000,
          "src3" -> 2500, "src4" -> 500)
        graft.operators.Downsample.mixByWeight(
          t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", mix)
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
          .orderBy("source")
      },
      Some("""WITH b AS (
             |  SELECT doc_id, source,
             |    ('0x'||substr(md5('mix#' || doc_id::VARCHAR),1,15))::BIGINT % 10000 AS bucket
             |  FROM documents),
             |rates(source, bp) AS (VALUES
             |  ('src0', 10000), ('src1', 8000), ('src2', 5000),
             |  ('src3', 2500), ('src4', 500))
             |SELECT b.source, count(*) AS n_kept
             |FROM b JOIN rates r ON b.source = r.source
             |WHERE b.bucket < r.bp
             |GROUP BY b.source ORDER BY b.source""".stripMargin)),

    // Semi-structured props: JSON field extraction.
    Q("q45_json_extract",
      (s, dir) => Sources.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)),

    // WARC record extraction (Warc.explodeWarcBlobs): the FIRST step of a
    // crawl pipeline — split a WARC dump into one row per record. The
    // synth blobs pack 1-3 records with id-derived types/URIs/payload
    // lengths plus three traps (lowercase content-length, a truncated
    // trailing record that must be dropped with the complete ones kept,
    // and a garbage first line that must yield ZERO records — WARC has no
    // resync marker). The oracle rebuilds every record's text with id
    // arithmetic and recomputes byte OFFSETS as a running sum of record
    // lengths, so the parser's position accounting is pinned exactly.
    // Scale shape: the flatMap is a narrow map-side explode (records
    // never shuffle); file-level parallelism for real dumps lives in
    // Warc.warcRecords.
    Q("q140_warc_records",
      (s, dir) => graft.sources.Warc.explodeWarcBlobs(
          graft.sources.Warc.synthWarcBytes(t(s, dir, "documents"),
            "doc_id"))
        .select(col("media_id"), col("rec_idx"), col("offset"),
          col("warc_type"), col("target_uri"), col("record_id"),
          col("content_length"),
          col("payload").cast(StringType).as("payload_str"))
        .orderBy("media_id", "rec_idx"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 100) + 100) % 100 AS site
             |  FROM documents),
             |r AS (
             |  SELECT m.*, t.k FROM m, (VALUES (0), (1), (2)) t(k)
             |  WHERE m.m11 <> 3 AND t.k <= m.m3),
             |rec AS (
             |  SELECT doc_id, k,
             |    CASE k WHEN 0 THEN 'response' WHEN 1 THEN 'request'
             |      ELSE 'metadata' END AS warc_type,
             |    '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '-' ||
             |      CAST(k AS VARCHAR) || '>' AS record_id,
             |    'http://site' || CAST(site AS VARCHAR) || '.com/p' ||
             |      CAST(k AS VARCHAR) AS target_uri,
             |    'P' || repeat('x', CAST(
             |      (((doc_id * 7 + k) % 50) + 50) % 50 + 10 AS INT))
             |      AS payload
             |  FROM r),
             |rl AS (
             |  SELECT doc_id, k, warc_type, target_uri, record_id, payload,
             |    CAST(length(payload) AS BIGINT) AS content_length,
             |    10 + 11 + length(warc_type) + 2
             |      + 16 + length(record_id) + 2
             |      + 17 + length(target_uri) + 2
             |      + 14 + 2 + length(CAST(length(payload) AS VARCHAR)) + 2
             |      + 2 + length(payload) + 4 AS reclen
             |  FROM rec)
             |SELECT doc_id AS media_id, CAST(k AS BIGINT) AS rec_idx,
             |  CAST(COALESCE(SUM(reclen) OVER (PARTITION BY doc_id
             |    ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND 1 PRECEDING), 0) AS BIGINT) AS "offset",
             |  warc_type, target_uri, record_id, content_length,
             |  payload AS payload_str
             |FROM rl ORDER BY media_id, rec_idx""".stripMargin)),

    // HTML -> text extraction (HtmlOps.htmlToText): the step between a
    // crawl payload and every text operator. The synth pages carry the
    // full trap set (script/style/comment bodies with markup, an
    // attribute value containing '>', CDATA, numeric + hex entities, the
    // &amp;#60; double-decode cascade trap, unterminated comment/script
    // tails) and the oracle rebuilds the EXPECTED text as ground-truth id
    // arithmetic — not a regex replay, so an extraction bug cannot cancel
    // out against its own oracle. Scale shape: per-row expressions at
    // scan speed, nothing shuffles.
    Q("q141_html_to_text",
      (s, dir) => graft.text.HtmlOps.htmlToText(
          graft.text.HtmlOps.synthHtml(t(s, dir, "documents"), "doc_id"),
          "html")
        .select(col("media_id"), col("text_extracted"),
          length(col("text_extracted")).cast(LongType).as("n_chars"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 9) + 9) % 9 AS m9,
             |    ((doc_id % 100) + 100) % 100 AS c100,
             |    ((doc_id % 50) + 50) % 50 AS c50
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    'T' || CAST(doc_id AS VARCHAR) ||
             |    ' Doc ' || CAST(doc_id AS VARCHAR) ||
             |    ' Para ' || CAST(c100 AS VARCHAR) ||
             |    ' & more AB &#60; literal' ||
             |    CASE WHEN m4 = 1
             |      THEN ' cd' || CAST(m9 AS VARCHAR) || ' data'
             |      ELSE '' END ||
             |    ' word' || CAST(c50 AS VARCHAR) || ' tail'
             |      AS text_extracted
             |  FROM m)
             |SELECT doc_id AS media_id, text_extracted,
             |  CAST(length(text_extracted) AS BIGINT) AS n_chars
             |FROM f ORDER BY media_id""".stripMargin)),

    // Unicode normalization + mojibake repair (UnicodeOps.normalizeText,
    // NFC via the native nfc_normalize codegen expression): three input
    // variants — decomposed-with-junk, whole-string mojibake (UTF-8
    // mis-decoded as Latin-1, repaired byte-exact), already-clean — all
    // normalize to ONE id-arithmetic clean string the oracle rebuilds
    // directly; `changed` pins that the clean variant is untouched (the
    // no-false-positive gate: its accented chars are valid UTF-8 lead
    // byte values). Scale shape: per-row expressions, nothing shuffles.
    Q("q142_unicode_normalize",
      (s, dir) => graft.text.UnicodeOps.normalizeText(
          graft.text.UnicodeOps.synthMojibake(t(s, dir, "documents"),
            "doc_id"),
          "text_raw")
        .select(col("media_id"), col("text_norm"),
          length(col("text_norm")).cast(LongType).as("n_chars"),
          (col("text_raw") =!= col("text_norm")).as("changed"))
        .orderBy("media_id"),
      Some("WITH m AS (\n" +
        "  SELECT doc_id,\n" +
        "    ((doc_id % 3) + 3) % 3 AS m3,\n" +
        "    ((doc_id % 50) + 50) % 50 AS c50\n" +
        "  FROM documents),\n" +
        "f AS (\n" +
        "  SELECT doc_id, m3,\n" +
        "    'Doc ' || CAST(doc_id AS VARCHAR) ||\n" +
        "    ' caf\u00e9 \u00e0 la ni\u00f1o ' ||\n" +
        "    CAST(c50 AS VARCHAR) || ' zap!' AS text_norm\n" +
        "  FROM m)\n" +
        "SELECT doc_id AS media_id, text_norm,\n" +
        "  CAST(length(text_norm) AS BIGINT) AS n_chars,\n" +
        "  m3 <> 2 AS changed\n" +
        "FROM f ORDER BY media_id"))
  ) ++ Seq(

    // PDF triage (Pdf.pdfTriage): version / linearization / approximate
    // page count (precedence: linearization /N -> trailer /Count ->
    // /Type /Page object count, with the /Type /Pages decoy excluded) /
    // last-startxref / %%EOF integrity / encryption — bounded head+tail
    // windows, expression-only. Traps: /Count omitted (fallback path),
    // truncation right after 'startxref' (field-by-field degradation),
    // non-PDF garbage (all NULL). Oracle is ground-truth id arithmetic.
    Q("q143_pdf_triage",
      (s, dir) => graft.multimodal.Pdf.pdfTriage(
          graft.multimodal.Pdf.synthPdfBytes(t(s, dir, "documents"),
            "doc_id"))
        .select(col("media_id"), col("pdf_version"), col("linearized"),
          col("n_pages_approx"), col("startxref"), col("has_eof"),
          col("encrypted"),
          octet_length(col("content")).cast(LongType).as("n_bytes"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 2) + 2) % 2 AS m2,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 5) + 5) % 5 AS m5,
             |    ((doc_id % 6) + 6) % 6 AS m6,
             |    ((doc_id % 7) + 7) % 7 AS m7,
             |    ((doc_id % 8) + 8) % 8 AS m8,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 13) + 13) % 13 AS m13,
             |    ((doc_id % 100) + 100) % 100 AS c100
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m2, m3, m5, m7, m11,
             |    CASE WHEN m13 = 9 THEN '2.0'
             |      ELSE '1.' || CAST(m8 AS VARCHAR) END AS ver,
             |    m6 + 1 AS n,
             |    9000 + c100 AS sx,
             |    CASE WHEN m2 = 0 THEN
             |      '1 0 obj' || chr(10) ||
             |      '<< /Linearized 1 /L 5000 /N ' ||
             |      CAST(m6 + 1 AS VARCHAR) || ' /H [500 200] >>' ||
             |      chr(10) || 'endobj' || chr(10) ELSE '' END AS lin,
             |    CASE WHEN m5 = 4 THEN ''
             |      ELSE '/Count ' || CAST(m6 + 1 AS VARCHAR) || ' '
             |      END AS cnt
             |  FROM m),
             |g AS (
             |  SELECT doc_id, m2, m3, m5, m7, m11, ver, n, sx,
             |    '%PDF-' || ver || chr(10) || lin ||
             |    '2 0 obj' || chr(10) ||
             |    '<< /Type /Pages /Kids [3 0 R] ' || cnt || '>>' ||
             |    chr(10) || 'endobj' || chr(10) ||
             |    repeat('3 0 obj' || chr(10) ||
             |      '<< /Type /Page /Parent 2 0 R >>' || chr(10) ||
             |      'endobj' || chr(10), n) ||
             |    'trailer' || chr(10) || '<< /Size 9 /Root 4 0 R' ||
             |    CASE WHEN m3 = 0 THEN ' /Encrypt 5 0 R' ELSE '' END ||
             |    ' >>' || chr(10) || 'startxref' || chr(10) ||
             |    CASE WHEN m7 = 2 THEN ''
             |      ELSE CAST(sx AS VARCHAR) || chr(10) || '%%EOF' ||
             |        chr(10) END AS pdf
             |  FROM f)
             |SELECT doc_id AS media_id,
             |  CASE WHEN m11 <> 6 THEN ver END AS pdf_version,
             |  CASE WHEN m11 <> 6 THEN m2 = 0 END AS linearized,
             |  CASE WHEN m11 <> 6 THEN CAST(n AS BIGINT) END
             |    AS n_pages_approx,
             |  CASE WHEN m11 <> 6 AND m7 <> 2 THEN CAST(sx AS BIGINT) END
             |    AS startxref,
             |  CASE WHEN m11 <> 6 THEN m7 <> 2 END AS has_eof,
             |  CASE WHEN m11 <> 6 THEN m3 = 0 END AS encrypted,
             |  CAST(CASE WHEN m11 = 6 THEN length('GARBAGE NOT A PDF')
             |    ELSE length(pdf) END AS BIGINT) AS n_bytes
             |FROM g ORDER BY media_id""".stripMargin)),

    // The COMPOSED crawl-ingestion pipeline — the capstone over the r14
    // operators, end to end under ONE oracle: synth WARC blobs whose
    // response payloads are full HTTP MESSAGES (chunked or
    // Content-Length framed) carrying synthHtml pages ->
    // Warc.explodeWarcBlobs (record split + offsets) ->
    // Http.parseHttpResponses (status/headers/de-chunking, WARC metadata
    // passing through) -> HtmlOps.htmlToText (markup strip + entity
    // decode) -> UnicodeOps.normalizeText (no-op on this clean corpus,
    // pinned by q142 — exercising the plumbing is the point) ->
    // UrlOps.canonicalizeUrls over WARC-Target-URI -> per-registrable-
    // domain accounting. The oracle rebuilds the EXPECTED extracted text
    // (q141's derivation) and the domain arithmetic directly — a failure
    // in any stage shows up as a census delta. Scale shape: every stage
    // is a narrow map-side transform; the single exchange is the final
    // domain aggregate's.
    Q("q144_crawl_ingest",
      (s, dir) => {
        val text = graft.pipeline.CrawlIngest.crawlText(
          graft.pipeline.CrawlIngest.synthCrawlBlobs(
            t(s, dir, "documents"), "doc_id"))
        UrlOps.canonicalizeUrls(text, "target_uri")
          .groupBy("registrable_domain")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).cast(LongType).as("sum_chars"))
          .orderBy("registrable_domain")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 9) + 9) % 9 AS m9,
             |    ((doc_id % 20) + 20) % 20 AS c20,
             |    ((doc_id % 100) + 100) % 100 AS c100,
             |    ((doc_id % 50) + 50) % 50 AS c50
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, c20,
             |    'T' || CAST(doc_id AS VARCHAR) ||
             |    ' Doc ' || CAST(doc_id AS VARCHAR) ||
             |    ' Para ' || CAST(c100 AS VARCHAR) ||
             |    ' & more AB &#60; literal' ||
             |    CASE WHEN m4 = 1
             |      THEN ' cd' || CAST(m9 AS VARCHAR) || ' data'
             |      ELSE '' END ||
             |    ' word' || CAST(c50 AS VARCHAR) || ' tail'
             |      AS text_norm
             |  FROM m)
             |SELECT 'crawl' || CAST(c20 AS VARCHAR) || '-site.com'
             |    AS registrable_domain,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(length(text_norm)) AS BIGINT) AS sum_chars
             |FROM f GROUP BY 1 ORDER BY registrable_domain""".stripMargin)),

    // HTTP response parsing (Http.parseHttpResponses): the layer between
    // a WARC response record and the HTML — status line + headers,
    // chunked DE-FRAMING (hex size lines with extensions, reassembled to
    // the original body), Content-Length vs truncation, and (spec-side,
    // JVM-built — expressions cannot gzip) gzip/deflate decode with a
    // decompression-bomb output cap. The oracle rebuilds status/headers/
    // body as ground-truth id arithmetic; the chunked variant proves
    // de-framing because the framed wire bytes NEVER equal the body.
    Q("q145_http_responses",
      (s, dir) => graft.sources.Http.parseHttpResponses(
          graft.sources.Http.synthHttpPayloads(t(s, dir, "documents"),
            "doc_id"))
        .select(col("media_id"), col("http_status"), col("content_type"),
          col("transfer_encoding"),
          col("body").cast(StringType).as("body_str"),
          octet_length(col("body")).cast(LongType).as("body_bytes"),
          col("body_truncated"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 5) + 5) % 5 AS m5,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 40) + 40) % 40 AS m40
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m3, m5, m11,
             |    'Body ' || CAST(doc_id AS VARCHAR) || ' ' ||
             |      repeat('f', CAST(m40 + 5 AS INT)) AS body
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CAST(CASE WHEN m11 = 7 THEN NULL
             |    WHEN m5 = 2 AND m3 <> 0 THEN 404
             |    ELSE 200 END AS INTEGER) AS http_status,
             |  CASE WHEN m11 = 7 THEN NULL
             |    WHEN m3 = 0 THEN 'text/plain'
             |    WHEN m5 = 2 THEN 'text/plain'
             |    ELSE 'text/html; charset=utf-8' END AS content_type,
             |  CASE WHEN m11 <> 7 AND m3 = 0 THEN 'chunked' END
             |    AS transfer_encoding,
             |  CASE WHEN m11 = 7 THEN NULL
             |    WHEN m3 = 0 THEN body
             |    WHEN m5 = 2 THEN ''
             |    ELSE body END AS body_str,
             |  CAST(CASE WHEN m11 = 7 THEN NULL
             |    WHEN m3 = 0 THEN length(body)
             |    WHEN m5 = 2 THEN 0
             |    ELSE length(body) END AS BIGINT) AS body_bytes,
             |  FALSE AS body_truncated
             |FROM f ORDER BY media_id""".stripMargin)),

    // Charset-aware body decoding (Http.withBodyText): CAST(body AS
    // STRING) is UTF-8-only, so a Latin-1/Windows-1252 page — still a
    // measurable slice of the web — mojibakes irreparably at ingest. One
    // variant per resolution path: header charset= param, HTML meta
    // sniff (with the 0x93/0x94 bytes where cp1252 and Latin-1 DIFFER),
    // UTF-8 validation, cp1252 total fallback on invalid UTF-8. The
    // oracle rebuilds every decoded string from chr() codepoints.
    Q("q146_charset_decode",
      (s, dir) => graft.sources.Http.withBodyText(
          graft.sources.Http.parseHttpResponses(
            graft.sources.Http.synthCharsetPayloads(
              t(s, dir, "documents"), "doc_id")))
        .select(col("media_id"), col("http_status"), col("charset_source"),
          col("body_text"),
          length(col("body_text")).cast(LongType).as("n_chars"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id, ((doc_id % 4) + 4) % 4 AS m4
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m4,
             |    CASE m4
             |      WHEN 0 THEN 'caf' || chr(233) || ' doc ' ||
             |        CAST(doc_id AS VARCHAR)
             |      WHEN 1 THEN '<html><head><meta charset=' ||
             |        '"windows-1252"></head><body>' || chr(8220) || 'q' ||
             |        CAST(doc_id AS VARCHAR) || chr(8221) ||
             |        '</body></html>'
             |      WHEN 2 THEN 'caf' || chr(233) || ' doc ' ||
             |        CAST(doc_id AS VARCHAR)
             |      ELSE 'raw' || chr(233) || ' doc ' ||
             |        CAST(doc_id AS VARCHAR) END AS body_text,
             |    CASE m4
             |      WHEN 0 THEN 'header:iso-8859-1'
             |      WHEN 1 THEN 'meta:windows-1252'
             |      WHEN 2 THEN 'sniff:utf-8'
             |      ELSE 'fallback:windows-1252' END AS charset_source
             |  FROM m)
             |SELECT doc_id AS media_id, CAST(200 AS INTEGER) AS http_status,
             |  charset_source, body_text,
             |  CAST(length(body_text) AS BIGINT) AS n_chars
             |FROM f ORDER BY media_id""".stripMargin)),

    // robots.txt parse + longest-prefix-match URL filtering
    // (RobotsOps.parseRobots / isAllowed): per-domain rules parsed ONCE
    // (one bounded fold over the file's lines), BROADCAST onto the URL
    // table by domain, decision per path at scan speed. The synth
    // exercises the selection semantics that actually bite: a decoy
    // group that disallows everything for another agent, an EMPTY
    // specific group that still shields the domain from '*', a
    // more-specific Allow carved out of a Disallow, and the
    // longest-match subtlety that '/p' allows '/private' under a
    // Disallow-all. Oracle is ground-truth id arithmetic.
    Q("q147_robots_filter",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val robots = graft.text.RobotsOps.parseRobots(
          graft.text.RobotsOps.synthRobots(docs, "doc_id"),
          "robots_txt", "graftbot")
        val urls = docs.select(col("doc_id").as("url_id"),
          pmod(col("doc_id"), lit(20)).as("domain_id"),
          element_at(array(lit("/"), lit("/p5"), lit("/private"),
            lit("/private/ok/x"), lit("/blocked"), lit("/q")),
            (pmod(col("doc_id"), lit(6)) + 1).cast("int")).as("path"))
        urls.join(
          broadcast(robots.select(col("domain_id"), col("robots_rules"))),
          Seq("domain_id"))
          .select(col("url_id"), col("domain_id"), col("path"),
            graft.text.RobotsOps.isAllowed(col("robots_rules"),
              col("path")).as("allowed"))
          .orderBy("url_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 20) + 20) % 20 AS domain_id,
             |    ((doc_id % 6) + 6) % 6 AS u
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, domain_id, u,
             |    domain_id % 3 AS d3,
             |    CASE u WHEN 0 THEN '/' WHEN 1 THEN '/p5'
             |      WHEN 2 THEN '/private' WHEN 3 THEN '/private/ok/x'
             |      WHEN 4 THEN '/blocked' ELSE '/q' END AS path
             |  FROM m)
             |SELECT doc_id AS url_id, CAST(domain_id AS BIGINT)
             |    AS domain_id, path,
             |  CASE WHEN d3 = 0 THEN u <> 2
             |       WHEN d3 = 1 THEN u IN (1, 2, 3)
             |       ELSE TRUE END AS allowed
             |FROM f ORDER BY url_id""".stripMargin)),

    // Main-content extraction (HtmlOps.extractMainText): block
    // segmentation + link-density scoring — the readability-class step
    // past naive tag stripping, because at corpus scale nav/sidebar/
    // footer boilerplate dominates n-gram statistics and dedup keys.
    // The synth pages carry a title and heading that die by LENGTH, a
    // nav and a link-farm div that die by DENSITY (their text is above
    // minChars — only the ratio removes them), and two content
    // paragraphs that survive, one with an in-threshold inline link.
    // Oracle rebuilds the expected text as id arithmetic.
    Q("q148_main_content",
      (s, dir) => graft.text.HtmlOps.extractMainText(
          graft.text.HtmlOps.synthBoilerplatePage(
            t(s, dir, "documents"), "doc_id"), "html")
        .select(col("media_id"), col("main_text"),
          length(col("main_text")).cast(LongType).as("n_chars"))
        .orderBy("media_id"),
      Some(("""WITH m AS (
             |  SELECT doc_id, ((doc_id % 50) + 50) % 50 AS c50
             |  FROM documents),
             |f AS (
             |  SELECT doc_id,
             |    'Main content ' || CAST(doc_id AS VARCHAR) || ' ' ||
             |    repeat('w', 30) ||
             |    ' alpha beta & gamma. Second part ' ||
             |    CAST(c50 AS VARCHAR) ||
             |    ' has one link plus ' || repeat('y', 20) ||
             |    ' trailing words.' AS main_text
             |  FROM m)
             |SELECT doc_id AS media_id, main_text,
             |  CAST(length(main_text) AS BIGINT) AS n_chars
             |FROM f ORDER BY media_id""").stripMargin)),

    // RFC 9309 wildcard robots matching (RobotsPathMatch + the same
    // parse/broadcast/decide shape as q147): `Disallow: /*.pdf$` and
    // `Allow: /public*` are ubiquitous in real robots files and a
    // literal-prefix matcher mis-decides both. The synth covers the
    // anchored-extension block, the specificity tie where a LONGER
    // wildcard Allow beats a shorter wildcard Disallow, a mid-pattern
    // `/*/ok` carve-out under Disallow-all, an anchored exact-path
    // `/p$` (which must NOT match '/private/p'), a double-star anchored
    // pattern, and a BOM prefix on every file (RFC 9309 §2.3). Oracle
    // is ground-truth id arithmetic (decisions derived by hand from the
    // RFC semantics, not replayed through a second matcher).
    Q("q149_robots_wildcards",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val robots = graft.text.RobotsOps.parseRobots(
          graft.text.RobotsOps.synthWildcardRobots(docs, "doc_id"),
          "robots_txt", "graftbot")
        val urls = docs.select(col("doc_id").as("url_id"),
          pmod(col("doc_id"), lit(12)).as("domain_id"),
          element_at(array(lit("/docs/x.pdf"), lit("/docs/x.pdfy"),
            lit("/public/file.pdf"), lit("/private/p"), lit("/x/ok"),
            lit("/p"), lit("/aXbYc"), lit("/aXbYcZ")),
            (pmod(col("doc_id"), lit(8)) + 1).cast("int")).as("path"))
        urls.join(
          broadcast(robots.select(col("domain_id"), col("robots_rules"))),
          Seq("domain_id"))
          .select(col("url_id"), col("domain_id"), col("path"),
            graft.text.RobotsOps.isAllowed(col("robots_rules"),
              col("path")).as("allowed"))
          .orderBy("url_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 12) + 12) % 12 AS domain_id,
             |    ((doc_id % 8) + 8) % 8 AS u
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, domain_id, u,
             |    domain_id % 3 AS d3,
             |    CASE u WHEN 0 THEN '/docs/x.pdf' WHEN 1 THEN '/docs/x.pdfy'
             |      WHEN 2 THEN '/public/file.pdf' WHEN 3 THEN '/private/p'
             |      WHEN 4 THEN '/x/ok' WHEN 5 THEN '/p'
             |      WHEN 6 THEN '/aXbYc' ELSE '/aXbYcZ' END AS path
             |  FROM m)
             |SELECT doc_id AS url_id, CAST(domain_id AS BIGINT)
             |    AS domain_id, path,
             |  CASE WHEN d3 = 0 THEN u NOT IN (0, 3)
             |       WHEN d3 = 1 THEN u IN (4, 5)
             |       ELSE u <> 6 END AS allowed
             |FROM f ORDER BY url_id""".stripMargin)),

    // Byte-level BPE tokenizer encode (Bpe.bpeEncode): the step between
    // a curated corpus and a training shard — greedy lowest-rank-first
    // merge passes over GPT-2-style pre-tokenized chunks, merge table
    // BROADCAST, text never shuffled. The corpus text is projected to
    // [a-z space] (chars == bytes) so DuckDB can replay the merge loop
    // exactly: a recursive CTE applies one merge RULE per round
    // (arg_min rank among pairs present), and DuckDB's replace() — all
    // non-overlapping occurrences, left to right — reproduces the
    // batch-merge pass bit-exactly on delimiter-wrapped token strings.
    // The oracle was independently cross-checked against a Python
    // reference implementation (500/500 docs) before wiring.
    Q("q150_bpe_tokenize",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val prepped = docs.select(col("doc_id"),
          lower(substring(
            regexp_replace(col("text"), "[^A-Za-z ]", ""), 1, 48))
            .as("bpe_text"))
        graft.text.Bpe.bpeEncode(prepped, "bpe_text")
          .select(col("doc_id"),
            size(col("bpe_tokens")).cast(LongType).as("n_tokens"),
            array_join(col("bpe_tokens"), "|").as("tokens_str"),
            aggregate(col("bpe_ids"), lit(0L), (a, x) => a + x)
              .as("ids_sum"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
             |prep AS (
             |  SELECT doc_id,
             |    lower(substr(regexp_replace(text, '[^A-Za-z ]', '', 'g'),
             |      1, 48)) AS t
             |  FROM documents),
             |merges(rank, l, r) AS (VALUES
             |  (0,'t','h'),(1,'th','e'),(2,'i','n'),(3,'a','n'),
             |  (4,'an','d'),(5,'o','n'),(6,'e','r'),(7,'r','e'),
             |  (8,'o','r'),(9,'s','t')),
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
             |      c -> '<' || c || '>'), 'string_agg', '') AS seq,
             |    0 AS it
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
             |toks AS (
             |  SELECT doc_id, word_idx, CAST(i AS INT) AS tok_idx,
             |    tl[CAST(i AS INT)] AS tok
             |  FROM (SELECT doc_id, word_idx,
             |          regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM final)
             |  CROSS JOIN unnest(range(1, len(tl) + 1)) r(i)),
             |ids AS (
             |  SELECT doc_id, word_idx, tok_idx, tok,
             |    CASE WHEN length(tok) = 1 THEN ascii(tok)
             |         ELSE 256 + (SELECT m.rank FROM merges m
             |                     WHERE m.l || m.r = tok) END AS id
             |  FROM toks),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |    string_agg(tok, '|' ORDER BY word_idx, tok_idx)
             |      AS tokens_str,
             |    CAST(sum(id) AS BIGINT) AS ids_sum
             |  FROM ids GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
             |  COALESCE(a.tokens_str, '') AS tokens_str,
             |  CAST(COALESCE(a.ids_sum, 0) AS BIGINT) AS ids_sum
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // PDF text extraction (Pdf.extractPdfText): content streams walked
    // in byte order — FlateDecode inflates via the JDK Inflater,
    // unfiltered streams read raw — and BT..ET show operators (Tj, ',
    // ", TJ arrays) collected with full literal-escape + hex-string
    // decoding. Turns q143's triage keep-pile into a TEXT SOURCE. The
    // synth exercises escapes, TJ kerning arrays, hex shows, a decoy
    // literal OUTSIDE any text object (must not extract), and a
    // garbage FlateDecode stream (must contribute nothing); compressed
    // happy paths are JVM-built goldens in PdfSpec (expressions cannot
    // deflate). Oracle is ground-truth id arithmetic.
    Q("q151_pdf_text",
      (s, dir) => graft.multimodal.Pdf.extractPdfText(
          graft.multimodal.Pdf.synthTextPdfBytes(
            t(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("pdf_text"), col("n_show_ops"),
          col("pdf_text_truncated"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 5) + 5) % 5 AS m5,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 50) + 50) % 50 AS m50
             |  FROM documents),
             |f AS (
             |  SELECT doc_id, m11,
             |    'Doc ' || CAST(doc_id AS VARCHAR) || ' alpha' ||
             |    CASE WHEN m3 = 1 THEN ' esc ( ) \ fin' ELSE '' END ||
             |    CASE WHEN m3 = 2 THEN ' kern pair ' ||
             |      CAST(m50 AS VARCHAR) ELSE '' END ||
             |    CASE WHEN m5 = 3 THEN ' Hi!' ELSE '' END AS pdf_text,
             |    CAST(1 + CASE WHEN m3 IN (1, 2) THEN 1 ELSE 0 END +
             |         CASE WHEN m5 = 3 THEN 1 ELSE 0 END AS BIGINT)
             |      AS n_show_ops
             |  FROM m)
             |SELECT doc_id AS media_id,
             |  CASE WHEN m11 = 6 THEN NULL ELSE pdf_text END AS pdf_text,
             |  CASE WHEN m11 = 6 THEN NULL ELSE n_show_ops END
             |    AS n_show_ops,
             |  CASE WHEN m11 = 6 THEN NULL ELSE FALSE END
             |    AS pdf_text_truncated
             |FROM f ORDER BY media_id""".stripMargin)),

    // Tokenize -> pack capstone: the LAST two steps between a curated
    // corpus and a training shard, COMPOSED — BPE token counts
    // (Bpe.bpeEncode, q150's exact tokenizer) feed fixed-budget
    // sequence packing (Packing.packSequences, q92's exact arithmetic:
    // hash-sharded running-sum offsets, no global window). The oracle
    // is the q150 recursive-CTE tokenizer truncated at token COUNTS,
    // joined into the q92 packing replay — so any divergence in either
    // stage, or in their composition, hash-fails.
    Q("q152_tokenize_pack",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val prepped = docs.select(col("doc_id"),
          lower(substring(
            regexp_replace(col("text"), "[^A-Za-z ]", ""), 1, 48))
            .as("bpe_text"))
        val toks = graft.text.Bpe.bpeEncode(prepped, "bpe_text")
          .select(col("doc_id"),
            size(col("bpe_tokens")).cast(LongType).as("n_tokens"))
        graft.operators.Packing.packSequences(
            toks, "doc_id", "n_tokens", 256L, 4)
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
             |prep AS (
             |  SELECT doc_id,
             |    lower(substr(regexp_replace(text, '[^A-Za-z ]', '', 'g'),
             |      1, 48)) AS t
             |  FROM documents),
             |merges(rank, l, r) AS (VALUES
             |  (0,'t','h'),(1,'th','e'),(2,'i','n'),(3,'a','n'),
             |  (4,'an','d'),(5,'o','n'),(6,'e','r'),(7,'r','e'),
             |  (8,'o','r'),(9,'s','t')),
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
             |      c -> '<' || c || '>'), 'string_agg', '') AS seq,
             |    0 AS it
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
             |ntok AS (
             |  SELECT doc_id, CAST(sum(len(regexp_extract_all(seq,
             |    '<([^<>]+)>', 1))) AS BIGINT) AS n_tokens
             |  FROM final GROUP BY doc_id),
             |alltok AS (
             |  SELECT d.doc_id, COALESCE(nt.n_tokens, 0) AS n_tokens
             |  FROM documents d LEFT JOIN ntok nt USING (doc_id)),
             |h AS (
             |  SELECT doc_id, n_tokens,
             |    ('0x'||substr(md5('pack#' || doc_id::VARCHAR),1,15))::BIGINT
             |      AS hv
             |  FROM alltok),
             |sh AS (SELECT doc_id, n_tokens, hv, hv % 4 AS shard FROM h),
             |rr AS (SELECT doc_id, n_tokens, shard,
             |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY shard
             |    ORDER BY hv, doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    AS BIGINT) AS st
             |  FROM sh)
             |SELECT doc_id, n_tokens, shard,
             |  st // 256 AS seq_idx,
             |  st % 256 AS seq_offset,
             |  CAST(greatest(1, (st + n_tokens - 1) // 256 - st // 256 + 1)
             |    AS BIGINT) AS n_spanned
             |FROM rr ORDER BY doc_id""".stripMargin)),

    // Sitemap XML explode (SitemapOps.explodeSitemap): the URL-frontier
    // side of crawl politeness — urlset entries (loc + optional
    // lastmod) and sitemapindex children, block-wise regexp extraction
    // with the XML entity decode sitemap URLs legally REQUIRE (&amp;
    // in every query-string URL). The synth covers both shapes, an
    // empty-but-recognized urlset (kept as a NULL-loc accounting row),
    // whitespace-padded loc values, and non-XML garbage. Oracle is
    // ground-truth id arithmetic.
    Q("q153_sitemap_explode",
      (s, dir) => graft.text.SitemapOps.explodeSitemap(
          graft.text.SitemapOps.synthSitemaps(
            t(s, dir, "documents"), "doc_id"), "sitemap_xml")
        .select(col("media_id"), col("sm_kind"), col("sm_loc"),
          col("sm_lastmod"))
        .orderBy("media_id", "sm_loc"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 5) + 5) % 5 AS m5,
             |    ((doc_id % 7) + 7) % 7 AS m7,
             |    ((doc_id % 8) + 8) % 8 AS m8,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 20) + 20) % 20 AS m20
             |  FROM documents),
             |cls AS (
             |  SELECT *, CASE WHEN m11 = 4 THEN 'garbage'
             |                 WHEN m5 = 2 THEN 'index'
             |                 WHEN m7 = 3 THEN 'empty'
             |                 ELSE 'urlset' END AS v
             |  FROM m),
             |rows_ AS (
             |  SELECT doc_id AS media_id, CAST(NULL AS VARCHAR) AS sm_kind,
             |    CAST(NULL AS VARCHAR) AS sm_loc,
             |    CAST(NULL AS VARCHAR) AS sm_lastmod
             |  FROM cls WHERE v = 'garbage'
             |  UNION ALL
             |  SELECT doc_id, 'sitemapindex',
             |    'https://s' || m20 || '.com/sitemap1.xml', '2026-01-15'
             |  FROM cls WHERE v = 'index'
             |  UNION ALL
             |  SELECT doc_id, 'sitemapindex',
             |    'https://s' || m20 || '.com/sitemap2.xml',
             |    CAST(NULL AS VARCHAR)
             |  FROM cls WHERE v = 'index'
             |  UNION ALL
             |  SELECT doc_id, 'urlset', CAST(NULL AS VARCHAR),
             |    CAST(NULL AS VARCHAR)
             |  FROM cls WHERE v = 'empty'
             |  UNION ALL
             |  SELECT doc_id, 'urlset',
             |    'https://s' || m20 || '.com/p' || k ||
             |      CASE WHEN m4 = 1 AND k = 1 THEN '?a=1&b=2' ELSE '' END,
             |    CASE WHEN m3 = 0 AND k = 1
             |      THEN '2026-0' || (m8 + 1) || '-0' || k END
             |  FROM cls CROSS JOIN (VALUES (1), (2), (3)) t(k)
             |  WHERE v = 'urlset' AND
             |    k <= CASE m3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END)
             |SELECT media_id, sm_kind, sm_loc, sm_lastmod
             |FROM rows_ ORDER BY media_id, sm_loc""".stripMargin)),

    // fastText-shaped linear classifier scoring (HashClassifier): the
    // corpus-scale model-filter stage — broadcast vocab of integer
    // milli-weights, md5-derived OOV hash buckets, BIGINT accumulator
    // (order-free, no float drift) divided ONCE at the end so both
    // engines agree bit-for-bit. The oracle inlines the same vocab as
    // a VALUES table and replays the OOV arithmetic.
    Q("q154_classifier_score",
      (s, dir) => graft.text.HashClassifier.scoreText(
          t(s, dir, "documents").select("doc_id", "text"), "text",
          graft.text.HashClassifier.demoVocab)
        .select(col("doc_id"), col("n_tokens"), col("milli_sum"),
          col("cls_score"), col("cls_label"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(trim(text)),
             |      '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tok AS (
             |  SELECT d.doc_id, u.t AS tok
             |  FROM d CROSS JOIN unnest(d.toks) u(t)
             |  WHERE len(d.toks) > 0),
             |vocab(tok, w) AS (VALUES
             |  ('fast',800),('slow',-800),('small',-200),('big',350),
             |  ('query',400),('table',150),('join',300),('window',250),
             |  ('stream',450),('batch',100),('data',50),('value',-50),
             |  ('row',-100),('scan',-300),('filter',200),('merge',275),
             |  ('spark',600),('hash',125),('column',175),('agg',-150),
             |  ('key',25),('part',-75),('order',90),('the',0)),
             |wt AS (
             |  SELECT tok.doc_id,
             |    COALESCE(v.w,
             |      ('0x'||substr(md5(tok.tok),1,15))::BIGINT % 201 - 100)
             |      AS w
             |  FROM tok LEFT JOIN vocab v USING (tok)),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(w) AS BIGINT) AS s
             |  FROM wt GROUP BY doc_id)
             |SELECT d2.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT)
             |    AS n_tokens,
             |  a.s AS milli_sum,
             |  CAST(a.s AS DOUBLE) / (1000 * a.n) AS cls_score,
             |  (CAST(a.s AS DOUBLE) / (1000 * a.n)) > 0 AS cls_label
             |FROM documents d2 LEFT JOIN agg a ON d2.doc_id = a.doc_id
             |ORDER BY d2.doc_id""".stripMargin)),

    // Sitemap freshness report: the recrawl-decision aggregate a
    // frontier scheduler runs over parsed sitemaps — per domain, how
    // many advertised URLs, how many carry lastmod, the newest lastmod,
    // and how many are fresher than the fleet's last-fetch watermark.
    // Exercises the W3C-datetime-to-DATE parse both engines must agree
    // on (first 10 chars cast to DATE) and composes q153's explode into
    // a groupBy — the discover -> parse -> decide loop end to end.
    Q("q155_sitemap_freshness",
      (s, dir) => {
        val ex = graft.text.SitemapOps.explodeSitemap(
          graft.text.SitemapOps.synthSitemaps(
            t(s, dir, "documents"), "doc_id"), "sitemap_xml")
        ex.where(col("sm_kind") === "urlset" && col("sm_loc").isNotNull)
          .select(pmod(col("media_id"), lit(20)).as("domain_id"),
            to_date(substring(col("sm_lastmod"), 1, 10)).as("lm"))
          .groupBy("domain_id")
          .agg(count(lit(1)).as("n_urls"),
            count(col("lm")).as("n_lastmod"),
            max(col("lm")).as("max_lastmod"),
            sum(when(col("lm") > to_date(lit("2026-04-15")), 1L)
              .otherwise(0L)).as("n_fresh"))
          .orderBy("domain_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 5) + 5) % 5 AS m5,
             |    ((doc_id % 7) + 7) % 7 AS m7,
             |    ((doc_id % 8) + 8) % 8 AS m8,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 20) + 20) % 20 AS m20
             |  FROM documents),
             |cls AS (
             |  SELECT *, CASE WHEN m11 = 4 THEN 'garbage'
             |                 WHEN m5 = 2 THEN 'index'
             |                 WHEN m7 = 3 THEN 'empty'
             |                 ELSE 'urlset' END AS v
             |  FROM m),
             |urls AS (
             |  SELECT doc_id, m20 AS domain_id,
             |    CASE WHEN m3 = 0 AND k = 1
             |      THEN CAST('2026-0' || (m8 + 1) || '-01' AS DATE)
             |    END AS lm
             |  FROM cls CROSS JOIN (VALUES (1), (2), (3)) t(k)
             |  WHERE v = 'urlset' AND
             |    k <= CASE m3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END)
             |SELECT CAST(domain_id AS BIGINT) AS domain_id,
             |  CAST(count(*) AS BIGINT) AS n_urls,
             |  CAST(count(lm) AS BIGINT) AS n_lastmod,
             |  max(lm) AS max_lastmod,
             |  CAST(sum(CASE WHEN lm > DATE '2026-04-15' THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_fresh
             |FROM urls GROUP BY domain_id
             |ORDER BY domain_id""".stripMargin)),

    // Redirect-chain resolution (RedirectResolve): successor-pointer
    // DOUBLING over the (url -> Location) edges parseHttpResponses
    // surfaces — chains collapse to their final destination in
    // ceil(log2(maxHops)) keyed self-joins (URLs only on the wire),
    // redirect LOOPS are flagged unresolved rather than followed
    // forever. The synth builds length-0..3 chains by id arithmetic
    // plus a planted 2-cycle (37<->38 in every 40-block) with a chain
    // that ENTERS the cycle (39 -> 38) — the three poisoned residues
    // per block must flag, everyone else resolves with exact hop
    // counts. Oracle is ground-truth id arithmetic.
    Q("q156_redirect_resolve",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val m4 = pmod(col("doc_id"), lit(4))
        val r40 = pmod(col("doc_id"), lit(40))
        def u(c: org.apache.spark.sql.Column) =
          concat(lit("http://g.com/p"), c.cast("string"))
        val edges = docs.where(m4 =!= 0)
          .select(u(col("doc_id")).as("src"),
            u(when(r40 === 37, col("doc_id") + 1)
              .otherwise(col("doc_id") - 1)).as("dst"))
        graft.operators.RedirectResolve
          .resolveRedirects(edges, "src", "dst", maxHops = 8,
            universe = Some(docs.select(u(col("doc_id")).as("url"))))
          .orderBy("url")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 40) + 40) % 40 AS r40
             |  FROM documents)
             |SELECT 'http://g.com/p' || doc_id AS url,
             |  CASE WHEN r40 IN (37, 38, 39) THEN NULL
             |       ELSE 'http://g.com/p' || (doc_id - m4) END AS final_url,
             |  CAST(CASE WHEN r40 IN (37, 38, 39) THEN NULL
             |       ELSE m4 END AS BIGINT) AS n_hops,
             |  r40 IN (37, 38, 39) AS unresolved
             |FROM m ORDER BY url""".stripMargin)),

    // BPE TRAINING (Bpe.learnMerges): learn the merge table FROM the
    // corpus — the classic Sennrich algorithm in its scale-true form:
    // train on the word-TYPE histogram (vocab-bounded state at any
    // corpus size), one (l,r)-keyed groupBy per round, the per-round
    // argmax is the one justified driver-side row, ties break
    // lexicographically for cross-engine determinism. The oracle
    // UNROLLS six training rounds as chained CTEs over the same
    // delimiter-wrapped sequences (validated against an independent
    // Python reference before wiring). The learned table feeds
    // straight into q150's encoder.
    Q("q157_bpe_train",
      (s, dir) => graft.text.Bpe.learnMerges(
          t(s, dir, "documents").select(
            lower(substring(regexp_replace(col("text"), "[^A-Za-z ]", ""),
              1, 48)).as("bpe_text")),
          "bpe_text", 6)
        .orderBy("rank"),
      Some("""
             |WITH prep AS (
             |  SELECT doc_id, lower(substr(regexp_replace(text, '[^A-Za-z ]', '', 'g'),
             |    1, 48)) AS t
             |  FROM documents),
             |words AS (
             |  SELECT ws[CAST(i AS INT)] AS word
             |  FROM (SELECT regexp_extract_all(t, ' ?[a-z]+| +') AS ws FROM prep)
             |  CROSS JOIN unnest(range(1, len(ws) + 1)) r(i)),
             |hist AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM words
             |  GROUP BY word),
             |s0 AS (
             |  SELECT cnt, list_aggregate(list_transform(string_split_regex(word, ''),
             |    c -> '<' || c || '>'), 'string_agg', '') AS seq
             |  FROM hist),
             |p1 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s0)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b1 AS (SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1),
             |s1 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s0 s CROSS JOIN b1 b),
             |p2 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s1)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b2 AS (SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1),
             |s2 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s1 s CROSS JOIN b2 b),
             |p3 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s2)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b3 AS (SELECT l, r, c FROM p3 ORDER BY c DESC, l, r LIMIT 1),
             |s3 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s2 s CROSS JOIN b3 b),
             |p4 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s3)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b4 AS (SELECT l, r, c FROM p4 ORDER BY c DESC, l, r LIMIT 1),
             |s4 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s3 s CROSS JOIN b4 b),
             |p5 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s4)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b5 AS (SELECT l, r, c FROM p5 ORDER BY c DESC, l, r LIMIT 1),
             |s5 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s4 s CROSS JOIN b5 b),
             |p6 AS (
             |  SELECT tl[CAST(j AS INT)] AS l, tl[CAST(j AS INT) + 1] AS r,
             |    CAST(sum(cnt) AS BIGINT) AS c
             |  FROM (SELECT cnt, regexp_extract_all(seq, '<([^<>]+)>', 1) AS tl
             |        FROM s5)
             |  CROSS JOIN unnest(range(1, len(tl))) u(j)
             |  GROUP BY 1, 2),
             |b6 AS (SELECT l, r, c FROM p6 ORDER BY c DESC, l, r LIMIT 1),
             |s6 AS (
             |  SELECT s.cnt,
             |    replace(s.seq, '<'||b.l||'><'||b.r||'>', '<'||b.l||b.r||'>') AS seq
             |  FROM s5 s CROSS JOIN b6 b)
             |SELECT * FROM (SELECT CAST(0 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b1
             |  UNION ALL SELECT CAST(1 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b2
             |  UNION ALL SELECT CAST(2 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b3
             |  UNION ALL SELECT CAST(3 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b4
             |  UNION ALL SELECT CAST(4 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b5
             |  UNION ALL SELECT CAST(5 AS INT) AS rank, l AS left_tok, r AS right_tok,
             |    c AS pair_count FROM b6)
             |ORDER BY rank""".stripMargin)),

    // PDF composite-font honesty (Pdf.extractPdfText): Type0/Identity-H
    // fonts show 2-byte GLYPH IDS, not character codes — extracting
    // them as Latin-1 would emit mojibake into every downstream text
    // stage. Detection is two-signal (declared /Type0|/Identity-H
    // dicts; NUL bytes inside a show string — Latin-1 text never
    // carries NUL, glyph ids for ASCII-range text always do) and the
    // contract is the parser family's malformed→NULL: text NULL, flag
    // true, show accounting survives. Oracle is ground-truth id
    // arithmetic over the synth exhibits.
    Q("q158_pdf_composite_font",
      (s, dir) => graft.multimodal.Pdf.extractPdfText(
          graft.multimodal.Pdf.synthCompositePdfBytes(
            t(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("pdf_text"), col("n_show_ops"),
          col("pdf_text_truncated"), col("pdf_composite_font"))
        .orderBy("media_id"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 4) + 4) % 4 AS m4,
             |    ((doc_id % 11) + 11) % 11 AS m11
             |  FROM documents)
             |SELECT doc_id AS media_id,
             |  CASE WHEN m11 = 6 OR m4 IN (1, 2) THEN NULL
             |       ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || ' plain'
             |       END AS pdf_text,
             |  CASE WHEN m11 = 6 THEN NULL
             |       WHEN m4 = 2 THEN CAST(2 AS BIGINT)
             |       ELSE CAST(1 AS BIGINT) END AS n_show_ops,
             |  CASE WHEN m11 = 6 THEN NULL ELSE FALSE
             |       END AS pdf_text_truncated,
             |  CASE WHEN m11 = 6 THEN NULL ELSE m4 IN (1, 2)
             |       END AS pdf_composite_font
             |FROM m ORDER BY media_id""".stripMargin)),

    // Classifier TRAINING (HashClassifier.fitLogistic): full-batch
    // logistic fit with a hard-sigmoid link in integer milli-units —
    // no exp(), so DuckDB replays every epoch bit-exactly (the q157
    // training-loop discipline applied to classification). Per epoch:
    // weights broadcast, one narrow flatMap computes per-doc error and
    // emits (token, err) instances, ONE token-keyed groupBy carries the
    // gradient, the vocab-bounded sum collects for the driver-side
    // update w' = w + floorDiv(64·G, 1000·N). Labels are id parity
    // (training mechanics are what is under test, not label quality).
    // floorDiv in SQL uses the positive-shift trick because DuckDB's
    // // truncates toward zero while Java's floorDiv floors.
    Q("q159_classifier_fit",
      (s, dir) => graft.text.HashClassifier.fitLogistic(
          t(s, dir, "documents").select(
            (pmod(col("doc_id"), lit(2)) === 0).as("label"),
            col("text")),
          "text", "label", epochs = 3)
        .orderBy("token"),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 2) + 2) % 2 = 0 THEN 1000
             |         ELSE 0 END AS y,
             |    list_filter(regexp_split_to_array(lower(trim(text)),
             |      '\s+'), x -> x <> '') AS toks
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
             |         (64 * g1.g + 1000000000 * n.n) // (1000 * n.n)
             |           - 1000000 AS w
             |       FROM g1, n),
             |z2 AS (SELECT t.doc_id,
             |         CAST(sum(COALESCE(w1.w, 0)) AS BIGINT) AS z
             |       FROM tok t LEFT JOIN w1 ON t.tok = w1.tok
             |       GROUP BY t.doc_id),
             |e2 AS (SELECT d.doc_id,
             |         d.y - LEAST(1000, GREATEST(0,
             |           500 + ((z2.z + 4000000) // 4 - 1000000))) AS err
             |       FROM d JOIN z2 USING (doc_id)),
             |g2 AS (SELECT t.tok, CAST(sum(e.err) AS BIGINT) AS g
             |       FROM tok t JOIN e2 e USING (doc_id) GROUP BY t.tok),
             |w2 AS (SELECT g2.tok,
             |         COALESCE(w1.w, 0) +
             |           ((64 * g2.g + 1000000000 * n.n) // (1000 * n.n)
             |             - 1000000) AS w
             |       FROM g2 LEFT JOIN w1 ON g2.tok = w1.tok, n),
             |z3 AS (SELECT t.doc_id,
             |         CAST(sum(COALESCE(w2.w, 0)) AS BIGINT) AS z
             |       FROM tok t LEFT JOIN w2 ON t.tok = w2.tok
             |       GROUP BY t.doc_id),
             |e3 AS (SELECT d.doc_id,
             |         d.y - LEAST(1000, GREATEST(0,
             |           500 + ((z3.z + 4000000) // 4 - 1000000))) AS err
             |       FROM d JOIN z3 USING (doc_id)),
             |g3 AS (SELECT t.tok, CAST(sum(e.err) AS BIGINT) AS g
             |       FROM tok t JOIN e3 e USING (doc_id) GROUP BY t.tok),
             |w3 AS (SELECT g3.tok,
             |         COALESCE(w2.w, 0) +
             |           ((64 * g3.g + 1000000000 * n.n) // (1000 * n.n)
             |             - 1000000) AS w
             |       FROM g3 LEFT JOIN w2 ON g3.tok = w2.tok, n)
             |SELECT tok AS token, CAST(w AS INTEGER) AS milli_weight
             |FROM w3 ORDER BY token""".stripMargin)),

    // Packed-shard EMISSION (Packing.emitPackedSequences): q152 reports
    // where each doc LANDS; this materializes the actual fixed-budget
    // sequences a shard file stores — token ids, contributing doc ids,
    // and the intra-sequence doc offsets a loader needs for attention
    // masking. One exchange total: the assembly groupBy reuses the
    // running-sum window's shard partitioning (spec-pinned). Token
    // arrays here are id arithmetic (n = id mod 13, tok_i = (31·id+i)
    // mod 997) so the oracle rebuilds sequences without the BPE CTE;
    // the real-BPE composition is PackingSpec's concat-identity
    // property test.
    Q("q160_pack_emit",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          when(pmod(col("doc_id"), lit(13)) > 0, expr(
            """transform(sequence(CAST(1 AS BIGINT), pmod(doc_id, 13)),
              |  i -> CAST(pmod(doc_id * 31 + i, 997) AS INT))"""
              .stripMargin))
            .otherwise(expr("CAST(array() AS ARRAY<INT>)")).as("toks"))
        graft.operators.Packing.emitPackedSequences(
            docs, "doc_id", "toks", 32L, 4)
          .select(col("shard"), col("seq_idx"), col("n_tokens"),
            array_join(col("seq_tokens"), ",").as("tokens_str"),
            array_join(col("doc_ids"), ",").as("doc_ids_str"),
            array_join(col("doc_offsets"), ",").as("doc_offs_str"))
          .orderBy("shard", "seq_idx")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, ((doc_id % 13) + 13) % 13 AS n
             |  FROM documents),
             |toks AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
             |    CAST(((doc_id * 31 + i) % 997 + 997) % 997 AS BIGINT)
             |      AS tok
             |  FROM d CROSS JOIN unnest(range(1, n + 1)) r(i)),
             |h AS (
             |  SELECT doc_id, n,
             |    ('0x'||substr(md5('pack#' || doc_id::VARCHAR),1,15))
             |      ::BIGINT AS hv
             |  FROM d),
             |rr AS (
             |  SELECT doc_id, n, hv, hv % 4 AS shard,
             |    CAST(coalesce(SUM(n) OVER (PARTITION BY hv % 4
             |      ORDER BY hv, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS st
             |  FROM h),
             |pieces AS (
             |  SELECT r.shard, r.hv, r.doc_id, CAST(s.s AS BIGINT)
             |      AS seq_idx,
             |    greatest(0, s.s * 32 - r.st) AS frm,
             |    least(r.n, (s.s + 1) * 32 - r.st) AS unt,
             |    r.st + greatest(0, s.s * 32 - r.st) - s.s * 32 AS off
             |  FROM rr r
             |  CROSS JOIN unnest(range(r.st // 32,
             |    (r.st + r.n - 1) // 32 + 1)) s(s)
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
             |FROM seqs ORDER BY shard, seq_idx""".stripMargin)),

    // FRONTIER-BUILD capstone — the crawl-side q85: compose the r15/r16
    // pieces into one admission funnel. Candidate URLs (sitemap-
    // advertised ∪ crawl-seen, distinct) → RFC 9309 wildcard robots
    // filter (rules BROADCAST per domain, q149's parser+matcher over
    // paths WITH query strings — note anchored '$' rules stop matching
    // once '?v=' is appended, so the per-(d3,u) truth table here is
    // derived fresh, not copied from q149) → redirect resolution
    // (q156's pointer-doubling, log-bounded rounds, loops dropped) →
    // per-domain cap (capPerKey's hash order, replayed in the oracle)
    // → per-domain funnel report. candidates/allowed count by SOURCE
    // domain; final/admitted by the FINAL url's domain.
    Q("q161_frontier_build",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val id = col("doc_id")
        def m(c: org.apache.spark.sql.Column, k: Int) = pmod(c, lit(k))
        val paths = array(lit("/docs/x.pdf"), lit("/docs/x.pdfy"),
          lit("/public/file.pdf"), lit("/private/p"), lit("/x/ok"),
          lit("/p"), lit("/aXbYc"), lit("/aXbYcZ"))
        def pathOf(c: org.apache.spark.sql.Column) = concat(
          element_at(paths, (m(c, 8) + 1).cast("int")),
          lit("?v="), c.cast("string"))
        def urlOf(c: org.apache.spark.sql.Column) = concat(
          lit("https://d"), m(c, 12).cast("string"), lit(".com"),
          pathOf(c))
        // 1. candidates: sitemap-advertised ∪ crawl-seen (urlOf is
        // injective in the id, so the distinct on uid IS the distinct
        // on url, without shuffling strings)
        val cand = docs.where(m(id, 3) =!= 0).select(id.as("uid"))
          .unionByName(docs.where(m(id, 2) === 0).select(id.as("uid")))
          .distinct()
          .select(col("uid"), m(col("uid"), 12).as("domain_id"),
            pathOf(col("uid")).as("path"), urlOf(col("uid")).as("url"))
        // 2. robots wildcard gate, rules broadcast per domain
        val robots = graft.text.RobotsOps.parseRobots(
          graft.text.RobotsOps.synthWildcardRobots(docs, "doc_id"),
          "robots_txt", "graftbot")
          .select(col("domain_id"), col("robots_rules"))
        // snap: `allowed` feeds the redirect universe, the finals join
        // AND the c2 aggregate — three re-derivations of the union+
        // distinct+robots-join+interpreted-matcher subtree without
        // truncation. r20 A/B (two paired same-window runs, q156 as
        // control): 1.73->1.50 s and control-normalized 2.89x->2.34x —
        // a mild local win where the r19 ALL-frames (cand+allowed+
        // finals) snap was a wash: one eager job buys back three
        // subtree re-runs, three eager jobs bought back too little.
        val allowed = graft.Graft.snap(cand
          .join(broadcast(robots), Seq("domain_id"))
          .where(graft.text.RobotsOps.isAllowed(col("robots_rules"),
            col("path")))
          .select(col("uid"), col("domain_id"), col("url")))
        // 3. redirect resolution over the crawl's edge set (q156 shape)
        val edges = docs.where(m(id, 4) =!= 0).select(
          urlOf(id).as("src"),
          urlOf(when(m(id, 40) === 37, id + 1).otherwise(id - 1))
            .as("dst"))
        val res = graft.operators.RedirectResolve.resolveRedirects(
          edges, "src", "dst", maxHops = 8,
          universe = Some(allowed.select(col("url"))))
        val finals = allowed.join(res, Seq("url"))
          .where(!col("unresolved"))
          .select(col("final_url")).distinct()
          .withColumn("final_domain", regexp_extract(col("final_url"),
            "^https://d([0-9]+)\\.", 1).cast(LongType))
          .withColumn("final_id", regexp_extract(col("final_url"),
            "v=([0-9]+)$", 1).cast(LongType))
        // 4. politeness cap: at most 5 admitted per destination domain
        val admitted = graft.operators.Downsample.capPerKey(
          finals, "final_domain", "final_url", 5)
        // 5. the funnel report
        val c1 = cand.groupBy("domain_id")
          .agg(count(lit(1)).as("n_candidates"))
        val c2 = allowed.groupBy("domain_id")
          .agg(count(lit(1)).as("n_allowed"))
        val c3 = finals.groupBy(col("final_domain").as("domain_id"))
          .agg(count(lit(1)).as("n_final"))
        val c4 = admitted.groupBy(col("final_domain").as("domain_id"))
          .agg(count(lit(1)).as("n_admitted"),
            sum(col("final_id")).as("admitted_id_sum"))
        c1.join(c2, Seq("domain_id"), "full_outer")
          .join(c3, Seq("domain_id"), "full_outer")
          .join(c4, Seq("domain_id"), "full_outer")
          .select(col("domain_id"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_allowed"), lit(0L)).as("n_allowed"),
            coalesce(col("n_final"), lit(0L)).as("n_final"),
            coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
            coalesce(col("admitted_id_sum"), lit(0L))
              .as("admitted_id_sum"))
          .orderBy("domain_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id AS i,
             |    ((doc_id % 12)+12)%12 AS dom,
             |    ((doc_id % 8)+8)%8 AS u,
             |    ((doc_id % 4)+4)%4 AS m4,
             |    ((doc_id % 40)+40)%40 AS r40
             |  FROM documents
             |  WHERE ((doc_id % 3)+3)%3 <> 0 OR ((doc_id % 2)+2)%2 = 0),
             |alw AS (
             |  SELECT * FROM base WHERE
             |    CASE dom % 3 WHEN 0 THEN u <> 3
             |         WHEN 1 THEN u = 4 ELSE TRUE END),
             |fin AS (SELECT DISTINCT i - m4 AS j FROM alw
             |        WHERE r40 NOT IN (37, 38, 39)),
             |finu AS (
             |  SELECT j, ((j % 12)+12)%12 AS fdom,
             |    'https://d' || CAST(((j % 12)+12)%12 AS VARCHAR) ||
             |    '.com' ||
             |    CASE ((j % 8)+8)%8 WHEN 0 THEN '/docs/x.pdf'
             |      WHEN 1 THEN '/docs/x.pdfy' WHEN 2 THEN '/public/file.pdf'
             |      WHEN 3 THEN '/private/p' WHEN 4 THEN '/x/ok'
             |      WHEN 5 THEN '/p' WHEN 6 THEN '/aXbYc'
             |      ELSE '/aXbYcZ' END ||
             |    '?v=' || CAST(j AS VARCHAR) AS url
             |  FROM fin),
             |adm AS (
             |  SELECT j, fdom, row_number() OVER (PARTITION BY fdom
             |    ORDER BY ('0x'||substr(md5('cap#'||url),1,15))::BIGINT,
             |      url) AS rn
             |  FROM finu),
             |c1 AS (SELECT dom, CAST(count(*) AS BIGINT) AS n_candidates
             |       FROM base GROUP BY dom),
             |c2 AS (SELECT dom, CAST(count(*) AS BIGINT) AS n_allowed
             |       FROM alw GROUP BY dom),
             |c3 AS (SELECT fdom AS dom, CAST(count(*) AS BIGINT)
             |         AS n_final FROM finu GROUP BY fdom),
             |c4 AS (SELECT fdom AS dom, CAST(count(*) AS BIGINT)
             |         AS n_admitted, CAST(sum(j) AS BIGINT)
             |         AS admitted_id_sum
             |       FROM adm WHERE rn <= 5 GROUP BY fdom),
             |doms AS (SELECT dom FROM c1 UNION SELECT dom FROM c3)
             |SELECT CAST(d.dom AS BIGINT) AS domain_id,
             |  COALESCE(c1.n_candidates, 0) AS n_candidates,
             |  COALESCE(c2.n_allowed, 0) AS n_allowed,
             |  COALESCE(c3.n_final, 0) AS n_final,
             |  COALESCE(c4.n_admitted, 0) AS n_admitted,
             |  COALESCE(c4.admitted_id_sum, 0) AS admitted_id_sum
             |FROM doms d
             |LEFT JOIN c1 ON d.dom = c1.dom
             |LEFT JOIN c2 ON d.dom = c2.dom
             |LEFT JOIN c3 ON d.dom = c3.dom
             |LEFT JOIN c4 ON d.dom = c4.dom
             |ORDER BY domain_id""".stripMargin)),

    // Product-quantization ANN (Similarity.pqEncode/pqAdcTopK): the
    // MEMORY side of planet-scale vector search — each 64-float vector
    // becomes m=4 codes, and ADC ranks candidates from a per-query
    // lookup table without touching the original floats. Codebooks are
    // FIXED (subvectors of vec_id < 4 — the q104 fixed-centroid
    // pattern: mechanics under test, not clustering quality; pqTrain
    // is the production path, PqSpec-verified). Distances are
    // squared-L2 with the per-query constant dropped (<c,c> - 2<v,c>),
    // so only sequential-fold dot products ride the comparison —
    // DuckDB's list_inner_product is bit-identical to Spark's fold
    // (verified at dims 16/64 on full-precision doubles). The oracle
    // pivots the m=4 LUT terms into an EXPLICIT ((d0+d1)+d2)+d3 sum so
    // the double accumulation order matches Spark's fold exactly.
    Q("q162_ann_pq_adc",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cb = graft.similarity.Similarity.pqCodebooks(
          e.where(col("id") < 4), 4)
        val codes = graft.similarity.Similarity.pqEncode(e, cb, 4)
        graft.similarity.Similarity.pqAdcTopK(
          e.where(col("id").between(100, 104)), codes, cb, 3, 4)
          .orderBy("query_id", "rank")
      },
      Some("""WITH cents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |subcents AS (
             |  SELECT CAST(s.s AS INT) AS sub, cid,
             |    cv[CAST(s.s*16+1 AS INT):CAST((s.s+1)*16 AS INT)] AS cvec
             |  FROM cents CROSS JOIN unnest([0,1,2,3]) s(s)),
             |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |         FROM embeddings),
             |enc AS (
             |  SELECT vec_id, sub, cid AS code FROM (
             |    SELECT v.vec_id, sc.sub, sc.cid,
             |      row_number() OVER (PARTITION BY v.vec_id, sc.sub
             |        ORDER BY list_inner_product(sc.cvec, sc.cvec)
             |          - 2 * list_inner_product(
             |              v.v[CAST(sc.sub*16+1 AS INT):
             |                  CAST((sc.sub+1)*16 AS INT)],
             |              sc.cvec) ASC,
             |          sc.cid ASC) AS rn
             |    FROM vecs v CROSS JOIN subcents sc) t
             |  WHERE rn = 1),
             |lut AS (
             |  SELECT q.vec_id AS qid, sc.sub, sc.cid,
             |    list_inner_product(sc.cvec, sc.cvec)
             |      - 2 * list_inner_product(
             |          q.v[CAST(sc.sub*16+1 AS INT):
             |              CAST((sc.sub+1)*16 AS INT)],
             |          sc.cvec) AS d
             |  FROM vecs q CROSS JOIN subcents sc
             |  WHERE q.vec_id BETWEEN 100 AND 104),
             |scored AS (
             |  SELECT l0.qid AS query_id, e0.vec_id AS neighbor_id,
             |    ((l0.d + l1.d) + l2.d) + l3.d AS dist
             |  FROM (SELECT * FROM enc WHERE sub = 0) e0
             |  JOIN (SELECT * FROM enc WHERE sub = 1) e1 USING (vec_id)
             |  JOIN (SELECT * FROM enc WHERE sub = 2) e2 USING (vec_id)
             |  JOIN (SELECT * FROM enc WHERE sub = 3) e3 USING (vec_id)
             |  JOIN lut l0 ON l0.sub = 0 AND l0.cid = e0.code
             |  JOIN lut l1 ON l1.sub = 1 AND l1.cid = e1.code
             |    AND l1.qid = l0.qid
             |  JOIN lut l2 ON l2.sub = 2 AND l2.cid = e2.code
             |    AND l2.qid = l0.qid
             |  JOIN lut l3 ON l3.sub = 3 AND l3.cid = e3.code
             |    AND l3.qid = l0.qid
             |  WHERE e0.vec_id <> l0.qid),
             |ranked AS (
             |  SELECT query_id, neighbor_id, dist,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, dist
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""
        .stripMargin)),

    // IVF + PQ composed — the faiss IndexIVFPQ layout, the full
    // billion-vector search shape: IVF probes bound which lists a
    // query SCANS (q104's multi-probe assignment, nprobe=2), PQ codes
    // bound what each candidate COSTS (q162's ADC), so scored pairs
    // drop from |corpus|x|queries| to the probed-list sizes and the
    // candidate floats are never read. Oracle = q104's cosine
    // assignment CTE joined into q162's encode/LUT replay.
    Q("q163_ann_ivf_pq",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = e.where(col("id") < 8)
          .select(col("id").as("cid"), col("vec"))
        // snap (truncate) the shared frames (r19; r20: Graft.snap —
        // reliable-checkpoint mode via graft.checkpoint.reliable, the
        // bare localCheckpoint was unrecoverable at cluster scale):
        // cb feeds both the
        // encode and the ADC LUT, codes and the candidate list feed the
        // scorer — inlined per reference, the final plan carried 32
        // Exchanges / 16 re-derived scans / 18 windows and the
        // optimizer walk dominated the wall (the q177/q178 lesson at
        // ANN scale). All three frames are small by construction
        // (codebooks/candidate lists), so eager truncation is cheap.
        val cb = graft.Graft.snap(graft.similarity.Similarity.pqCodebooks(
          e.where(col("id") < 4), 4))
        val codes = graft.Graft.snap(
          graft.similarity.Similarity.pqEncode(e, cb, 4))
        val queries = e.where(col("id").between(100, 104))
        val cand = graft.Graft.snap(graft.similarity.Similarity
          .ivfAssignN(queries, cents, 2)
          .select(col("id").as("query_id"), col("cid"))
          .join(graft.similarity.Similarity.ivfAssign(e, cents)
            .select(col("id").as("neighbor_id"), col("cid")),
            Seq("cid"))
          .select("query_id", "neighbor_id"))
        graft.similarity.Similarity.pqAdcTopK(
          queries, codes, cb, 3, 4, Some(cand))
          .orderBy("query_id", "rank")
      },
      Some("""WITH icents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
             |ranked_assign AS (
             |  SELECT e.vec_id, c.cid,
             |    row_number() OVER (PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(
             |        CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
             |        c.cid) AS rn
             |  FROM embeddings e CROSS JOIN icents c),
             |pqcents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 4),
             |subcents AS (
             |  SELECT CAST(s.s AS INT) AS sub, cid,
             |    cv[CAST(s.s*16+1 AS INT):CAST((s.s+1)*16 AS INT)] AS cvec
             |  FROM pqcents CROSS JOIN unnest([0,1,2,3]) s(s)),
             |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |         FROM embeddings),
             |enc AS (
             |  SELECT vec_id, sub, cid AS code FROM (
             |    SELECT v.vec_id, sc.sub, sc.cid,
             |      row_number() OVER (PARTITION BY v.vec_id, sc.sub
             |        ORDER BY list_inner_product(sc.cvec, sc.cvec)
             |          - 2 * list_inner_product(
             |              v.v[CAST(sc.sub*16+1 AS INT):
             |                  CAST((sc.sub+1)*16 AS INT)],
             |              sc.cvec) ASC,
             |          sc.cid ASC) AS rn
             |    FROM vecs v CROSS JOIN subcents sc) t
             |  WHERE rn = 1),
             |lut AS (
             |  SELECT q.vec_id AS qid, sc.sub, sc.cid,
             |    list_inner_product(sc.cvec, sc.cvec)
             |      - 2 * list_inner_product(
             |          q.v[CAST(sc.sub*16+1 AS INT):
             |              CAST((sc.sub+1)*16 AS INT)],
             |          sc.cvec) AS d
             |  FROM vecs q CROSS JOIN subcents sc
             |  WHERE q.vec_id BETWEEN 100 AND 104),
             |cand AS (
             |  SELECT qa.vec_id AS qid, ca.vec_id AS nid
             |  FROM ranked_assign qa
             |  JOIN ranked_assign ca ON ca.cid = qa.cid AND ca.rn = 1
             |  WHERE qa.rn <= 2 AND qa.vec_id BETWEEN 100 AND 104
             |    AND ca.vec_id <> qa.vec_id),
             |scored AS (
             |  SELECT c.qid AS query_id, c.nid AS neighbor_id,
             |    ((l0.d + l1.d) + l2.d) + l3.d AS dist
             |  FROM cand c
             |  JOIN (SELECT * FROM enc WHERE sub = 0) e0
             |    ON e0.vec_id = c.nid
             |  JOIN (SELECT * FROM enc WHERE sub = 1) e1
             |    ON e1.vec_id = c.nid
             |  JOIN (SELECT * FROM enc WHERE sub = 2) e2
             |    ON e2.vec_id = c.nid
             |  JOIN (SELECT * FROM enc WHERE sub = 3) e3
             |    ON e3.vec_id = c.nid
             |  JOIN lut l0 ON l0.qid = c.qid AND l0.sub = 0
             |    AND l0.cid = e0.code
             |  JOIN lut l1 ON l1.qid = c.qid AND l1.sub = 1
             |    AND l1.cid = e1.code
             |  JOIN lut l2 ON l2.qid = c.qid AND l2.sub = 2
             |    AND l2.cid = e2.code
             |  JOIN lut l3 ON l3.qid = c.qid AND l3.sub = 3
             |    AND l3.cid = e3.code),
             |ranked AS (
             |  SELECT query_id, neighbor_id, dist,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, dist
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""
        .stripMargin)),

    // Exact squared-L2 top-k (Similarity.bruteForceTopKL2): the
    // ground-truth referee for PQ recall — ADC approximates L2, not
    // cosine, so PqRecall measures against this. dist folds
    // per-element squared differences sequentially; DuckDB replays as
    // list_inner_product(d, d) over the same difference list (the
    // verified-bit-identical sequential sum).
    Q("q164_ann_l2_exact",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        graft.similarity.Similarity.bruteForceTopKL2(
          e.where(col("id").between(100, 104)),
          e.where(col("id") < 400), 5)
          .orderBy("query_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv FROM v
             |      WHERE vec_id BETWEEN 100 AND 104),
             |c AS (SELECT vec_id AS nid, v AS cv FROM v
             |      WHERE vec_id < 400),
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
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
        .stripMargin)),

    // RESIDUAL IVF+PQ (ivfResidualize → pqEncode → pqAdcTopKResidual):
    // the true IndexIVFPQ layout — codes quantize v − centroid, so one
    // codebook serves every list at much higher precision than raw-
    // vector PQ (q163), the measured-recall win in SCALING.md "PQ
    // recall". Search forms a per-(query, probed-list) residual and
    // LUT; dist = |qres|² + Σ_s lut (the |qres|² term must STAY —
    // candidates from different lists compete under different
    // residuals). Codebooks here are fixed residual exhibits (the
    // q104/q162 pattern: ids 10..13's residuals — ids < 8 ARE the
    // centroids, so their residuals would be zero vectors); pqTrain
    // over residuals is the production path. The oracle replays the
    // whole composition: cosine assignment → residual lists →
    // per-subspace argmin encode → probed-list ADC with the explicit
    // qn2 + (((d0+d1)+d2)+d3) double-accumulation order.
    Q("q165_ann_ivf_pq_residual",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = e.where(col("id") < 8)
          .select(col("id").as("cid"), col("vec"))
        val res = graft.similarity.Similarity.ivfResidualize(e, cents)
        // snap the shared frames (r19, the q163 rationale; r20:
        // Graft.snap for reliable-checkpoint mode):
        // without truncation the final plan carried 48 Exchanges / 32
        // re-derived scans / 30 windows
        val cb = graft.Graft.snap(graft.similarity.Similarity.pqCodebooks(
          res.where(col("id").between(10, 13)).select("id", "vec"), 4))
        val codes = graft.Graft.snap(
          graft.similarity.Similarity.pqEncode(res, cb, 4))
        graft.similarity.Similarity.pqAdcTopKResidual(
          e.where(col("id").between(100, 104)), codes, cb, cents,
          3, 4, nprobe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH icents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
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
             |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)])
             |      AS rv
             |  FROM vecs v
             |  JOIN ranked_assign ra ON ra.vec_id = v.vec_id
             |    AND ra.rn = 1
             |  JOIN icents ic ON ic.cid = ra.cid),
             |pqres AS (SELECT vec_id AS cid, rv AS cv FROM resid
             |          WHERE vec_id BETWEEN 10 AND 13),
             |subcents AS (
             |  SELECT CAST(s.s AS INT) AS sub, cid,
             |    cv[CAST(s.s*16+1 AS INT):CAST((s.s+1)*16 AS INT)] AS cvec
             |  FROM pqres CROSS JOIN unnest([0,1,2,3]) s(s)),
             |enc AS MATERIALIZED (
             |  SELECT vec_id, home, sub, code FROM (
             |    SELECT r.vec_id, r.cid AS home, sc.sub,
             |      sc.cid AS code,
             |      row_number() OVER (PARTITION BY r.vec_id, sc.sub
             |        ORDER BY list_inner_product(sc.cvec, sc.cvec)
             |          - 2 * list_inner_product(
             |              r.rv[CAST(sc.sub*16+1 AS INT):
             |                  CAST((sc.sub+1)*16 AS INT)],
             |              sc.cvec) ASC,
             |          sc.cid ASC) AS rn
             |    FROM resid r CROSS JOIN subcents sc) t
             |  WHERE rn = 1),
             |qres AS MATERIALIZED (
             |  SELECT ra.vec_id AS qid, ra.cid,
             |    list_transform(range(1, len(v.v) + 1),
             |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)])
             |      AS rv
             |  FROM ranked_assign ra
             |  JOIN vecs v ON v.vec_id = ra.vec_id
             |  JOIN icents ic ON ic.cid = ra.cid
             |  WHERE ra.rn <= 2 AND ra.vec_id BETWEEN 100 AND 104),
             |lut AS MATERIALIZED (
             |  SELECT q.qid, q.cid AS pcid, sc.sub, sc.cid AS code,
             |    list_inner_product(sc.cvec, sc.cvec)
             |      - 2 * list_inner_product(
             |          q.rv[CAST(sc.sub*16+1 AS INT):
             |              CAST((sc.sub+1)*16 AS INT)],
             |          sc.cvec) AS d
             |  FROM qres q CROSS JOIN subcents sc),
             |qn AS (SELECT qid, cid AS pcid,
             |         list_inner_product(rv, rv) AS qn2
             |       FROM qres),
             |scored AS (
             |  SELECT q.qid AS query_id, r.vec_id AS neighbor_id,
             |    qn.qn2 + (((l0.d + l1.d) + l2.d) + l3.d) AS dist
             |  FROM resid r
             |  JOIN qres q ON q.cid = r.cid AND r.vec_id <> q.qid
             |  JOIN enc e0 ON e0.vec_id = r.vec_id AND e0.sub = 0
             |  JOIN enc e1 ON e1.vec_id = r.vec_id AND e1.sub = 1
             |  JOIN enc e2 ON e2.vec_id = r.vec_id AND e2.sub = 2
             |  JOIN enc e3 ON e3.vec_id = r.vec_id AND e3.sub = 3
             |  JOIN lut l0 ON l0.qid = q.qid AND l0.pcid = q.cid
             |    AND l0.sub = 0 AND l0.code = e0.code
             |  JOIN lut l1 ON l1.qid = q.qid AND l1.pcid = q.cid
             |    AND l1.sub = 1 AND l1.code = e1.code
             |  JOIN lut l2 ON l2.qid = q.qid AND l2.pcid = q.cid
             |    AND l2.sub = 2 AND l2.code = e2.code
             |  JOIN lut l3 ON l3.qid = q.qid AND l3.pcid = q.cid
             |    AND l3.sub = 3 AND l3.code = e3.code
             |  JOIN qn ON qn.qid = q.qid AND qn.pcid = q.cid),
             |ranked AS (
             |  SELECT query_id, neighbor_id, dist,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, dist
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""
        .stripMargin)),

    // Perceptual image hash (Multimodal.imageDhash): 64-bit dHash over
    // the expression-decodable pixel formats — 9x8 nearest-neighbor
    // luminance grid, bit gy*8+gx = right-neighbor-brighter. The synth
    // corpus stores the SAME 9x8 pixel formula in three layouts the
    // parser must normalize identically (24bpp bottom-up BMP, 32bpp
    // top-down BMP, single-image ICO with doubled DIB height); ids
    // congruent mod 256 render identical pixels ACROSS layouts, so
    // cross-container content dups exist by construction. pmod 10 = 1
    // plants a one-pixel near-dup of id-1; pmod 11 = 6 is garbage →
    // NULL. Oracle recomputes every bit as id arithmetic; the signed-
    // long combine goes through HUGEINT because bit 63 is data.
    // dhash compares as STRING: the driver's pandas-side harness
    // degrades a NULLABLE BIGINT to float64, which cannot round-trip a
    // 64-bit hash magnitude (> 2^53) — the decimal-vs-float lesson.
    Q("q166_image_dhash",
      (s, dir) => graft.multimodal.Multimodal.imageDhash(
          graft.multimodal.Multimodal.synthDhashImageBytes(
            t(s, dir, "documents").select("doc_id"), "doc_id"))
        .select(col("media_id"), col("dhash").cast("string").as("dhash"))
        .orderBy("media_id"),
      Some("""WITH ids AS (SELECT doc_id FROM documents),
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
             |ORDER BY media_id""".stripMargin)),

    // Image CONTENT near-dup (imageDhash → simhashBandedDups): the
    // perceptual-hash dedup pass byte-exact dedup (q30) cannot do —
    // recompressed/re-containered/one-pixel-watermarked copies land at
    // small Hamming distance and the banding finds EXACTLY the pairs
    // with distance <= maxHamming (pigeonhole-lossless, the q33
    // contract, here over the full 64 signed bits via unsigned chunk
    // shifts). The id<2000 bound keeps the ORACLE's all-pairs check
    // feasible; the Spark side is the banded join at any scale.
    Q("q167_image_neardup",
      (s, dir) => {
        // imageDhashFast: the banding composition reads the JVM decode
        // rung (ImageDhashSpec pins it bit-identical to the expression
        // dHash); q166/q125-class exhibits keep the expression form
        val sigs = graft.multimodal.Multimodal.imageDhashFast(
            graft.multimodal.Multimodal.synthDhashImageBytes(
              t(s, dir, "documents").select("doc_id")
                .where(col("doc_id") < 2000), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        // snap: the banded self-join derives its two sides from the
        // signature frame independently — without truncation each side
        // re-runs the whole decode pipeline (r20, the q185 class)
        Dedup.simhashBandedDups(graft.Graft.snap(sigs), "id", 64, 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |            WHERE doc_id < 2000),
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
             |  FROM bits GROUP BY doc_id),
             |hh AS (
             |  SELECT doc_id,
             |    CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS dh
             |  FROM h
             |  WHERE ((doc_id % 11) + 11) % 11 <> 6)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
             |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.dh, b.dh)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // WET sidecar extraction (Warc.wetDocs): the Common Crawl
    // pre-extracted-text shape users reach for before raw response
    // WARCs — `conversion` records become (url, wet_text) docs, the
    // warcinfo prologue and truncated tails drop, payload decodes as
    // strict BOM-stripped UTF-8 (invalid bytes → NULL text, length
    // still accounted — the malformed→NULL contract). Oracle rebuilds
    // url/text/length as ground-truth id arithmetic over the synth WET
    // members (gz parity is WarcSpec's, the q140 pattern).
    Q("q168_wet_text",
      (s, dir) => graft.sources.Warc.wetDocs(
          graft.sources.Warc.explodeWarcBlobs(
            graft.sources.Warc.synthWetBytes(
              t(s, dir, "documents").select("doc_id"), "doc_id")))
        .select(col("media_id"), col("rec_idx"), col("url"),
          col("wet_text"), col("content_length"))
        .orderBy("media_id", "rec_idx"),
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    ((doc_id % 3) + 3) % 3 AS m3,
             |    ((doc_id % 9) + 9) % 9 AS m9,
             |    ((doc_id % 11) + 11) % 11 AS m11,
             |    ((doc_id % 13) + 13) % 13 AS m13,
             |    ((doc_id % 100) + 100) % 100 AS site
             |  FROM documents),
             |r AS (
             |  SELECT m.*, t.k FROM m, (VALUES (0), (1)) t(k)
             |  WHERE m.m11 <> 3 AND (t.k = 0 OR m.m3 >= 1)),
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
             |FROM rec ORDER BY media_id, rec_idx""".stripMargin)),

    // Built-in brotli content-coding (sources.Brotli via
    // Http.parseHttpResponses): REAL reference-encoder bytes decode
    // end-to-end inside the HTTP parse — including a stream that
    // references the Appendix-A static dictionary through Appendix-B
    // transforms; a malformed stream (reserved window-bits header)
    // NULLs the body while status/headers survive. The bodies are
    // literal encoder output (DuckDB cannot decode brotli), so the
    // oracle is ground-truth VALUES — the plaintexts the reference
    // encoder was fed.
    Q("q169_http_brotli",
      (s, dir) => {
        import s.implicits._
        val crlf = "\r\n"
        val head = "HTTP/1.1 200 OK" + crlf +
          "Content-Type: text/html" + crlf +
          "Content-Encoding: br" + crlf + crlf
        val rows = Seq(
          // q1 encoder output for 'hello hello hello brotli world 'x4
          (1L, "iz0AAICqqqrq/3Tl81lABEAEgAAYQEAABDbgWHMYxgkHwIFx2Bhz" +
            "bCmrCyzDjPUxei95UuFLMg=="),
          // q2 html output referencing the static dictionary through
          // non-identity transforms
          (2L, "G/0BAICqqqrq/3TVw00OFwY+3eUgAKoAIioCCgygA3AwFkRikhjg" +
            "ThttsFXJcr/5ADrKoEoNZiIMVkDEcPz56hs1Oy8Ugq3fYkxDsWZIIVJj" +
            "tMLA"),
          // the reserved window-bits pattern: malformed -> NULL body
          (3L, "EUFCQw=="))
        val df = rows.toDF("media_id", "b64")
          .select(col("media_id"),
            concat(lit(head).cast(BinaryType),
              unbase64(col("b64"))).as("payload"))
        graft.sources.Http.parseHttpResponses(df)
          .select(col("media_id"), col("http_status"),
            col("content_encoding"),
            col("body").cast(StringType).as("body_str"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 200, 'br',
             |   repeat('hello hello hello brotli world ', 4)),
             |  (CAST(2 AS BIGINT), 200, 'br',
             |   repeat('<html><head><title>t</title></head><body>' ||
             |     '<p>para one</p><p>para two</p></body></html>', 6)),
             |  (CAST(3 AS BIGINT), 200, 'br', NULL)
             |) t(media_id, http_status, content_encoding, body_str)
             |ORDER BY media_id""".stripMargin)),

    // Image dedup CAPSTONE — the full text-side dup-group pipeline
    // (q91's banding → connected components) run on image CONTENT:
    // dHash signatures → 64-bit banded candidates → pointer-jumping CC
    // labels each image's duplicate group across CONTAINERS (ids ≡ mod
    // 256 render identical pixels in different layouts) and one-pixel
    // plants. Same scale shape as the text twin: candidates bounded by
    // banding, CC rounds log-bounded with per-round checkpoint; the
    // oracle replays hashes as id arithmetic and closes the graph with
    // a recursive CTE (the q91 pattern).
    Q("q170_image_dup_groups",
      (s, dir) => {
        val sigs = graft.multimodal.Multimodal.imageDhashFast(
            graft.multimodal.Multimodal.synthDhashImageBytes(
              t(s, dir, "documents").select("doc_id")
                .where(col("doc_id") < 600), "doc_id"))
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        Dedup.connectedComponents(
          Dedup.simhashBandedDups(graft.Graft.snap(sigs), "id", 64, 2,
            probeParts = 0))
          .orderBy("id")
      },
      Some("""WITH RECURSIVE ids AS (
             |  SELECT doc_id FROM documents WHERE doc_id < 600),
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
             |  FROM bits GROUP BY doc_id),
             |hh AS (
             |  SELECT doc_id,
             |    CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS dh
             |  FROM h
             |  WHERE ((doc_id % 11) + 11) % 11 <> 6),
             |edges AS (
             |  SELECT a.doc_id AS src, b.doc_id AS dst
             |  FROM hh a JOIN hh b ON a.doc_id <> b.doc_id
             |  WHERE bit_count(xor(a.dh, b.dh)) <= 2),
             |reach(id, label) AS (
             |  SELECT src, src FROM edges
             |  UNION
             |  SELECT e.dst, r.label FROM reach r JOIN edges e
             |    ON e.src = r.id)
             |SELECT id, min(label) AS component
             |FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // ADC refine / re-rank (Similarity.pqRefine): the stage every
    // production IVF+PQ deployment runs after ADC — q165's residual
    // composition called with k = C = 12 (4×k), then the top-C
    // candidates join RAW vectors by neighbor_id and re-rank by exact
    // squared-L2 (q164's verified-bit-identical difference fold), so
    // the final ranking is exact over whatever ADC surfaced and
    // recall@k = P(true neighbor survived into the top C). One bounded
    // join (|queries|·C rows against the corpus), no |corpus|² term.
    // The oracle replays q165's full composition at rank <= 12, then
    // q164's exact-L2 arithmetic over the survivors.
    Q("q171_ann_pq_refine",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val cents = e.where(col("id") < 8)
          .select(col("id").as("cid"), col("vec"))
        val res = graft.similarity.Similarity.ivfResidualize(e, cents)
        // snap the shared frames (r19, the q163 rationale; r20:
        // Graft.snap for reliable-checkpoint mode):
        // without truncation the final plan carried 52 Exchanges / 36
        // re-derived scans / 34 windows — the C-candidate list feeding
        // the exact re-rank re-derived the whole residual-ADC pipeline
        val cb = graft.Graft.snap(graft.similarity.Similarity.pqCodebooks(
          res.where(col("id").between(10, 13)).select("id", "vec"), 4))
        val codes = graft.Graft.snap(
          graft.similarity.Similarity.pqEncode(res, cb, 4))
        val queries = e.where(col("id").between(100, 104))
        val adcTopC = graft.Graft.snap(
          graft.similarity.Similarity.pqAdcTopKResidual(
            queries, codes, cb, cents, 12, 4, nprobe = 2))
        graft.similarity.Similarity.pqRefine(queries, e, adcTopC, 3)
          .orderBy("query_id", "rank")
      },
      Some("""WITH icents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
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
             |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)])
             |      AS rv
             |  FROM vecs v
             |  JOIN ranked_assign ra ON ra.vec_id = v.vec_id
             |    AND ra.rn = 1
             |  JOIN icents ic ON ic.cid = ra.cid),
             |pqres AS (SELECT vec_id AS cid, rv AS cv FROM resid
             |          WHERE vec_id BETWEEN 10 AND 13),
             |subcents AS (
             |  SELECT CAST(s.s AS INT) AS sub, cid,
             |    cv[CAST(s.s*16+1 AS INT):CAST((s.s+1)*16 AS INT)] AS cvec
             |  FROM pqres CROSS JOIN unnest([0,1,2,3]) s(s)),
             |enc AS MATERIALIZED (
             |  SELECT vec_id, home, sub, code FROM (
             |    SELECT r.vec_id, r.cid AS home, sc.sub,
             |      sc.cid AS code,
             |      row_number() OVER (PARTITION BY r.vec_id, sc.sub
             |        ORDER BY list_inner_product(sc.cvec, sc.cvec)
             |          - 2 * list_inner_product(
             |              r.rv[CAST(sc.sub*16+1 AS INT):
             |                  CAST((sc.sub+1)*16 AS INT)],
             |              sc.cvec) ASC,
             |          sc.cid ASC) AS rn
             |    FROM resid r CROSS JOIN subcents sc) t
             |  WHERE rn = 1),
             |qres AS MATERIALIZED (
             |  SELECT ra.vec_id AS qid, ra.cid,
             |    list_transform(range(1, len(v.v) + 1),
             |      i -> v.v[CAST(i AS INT)] - ic.cv[CAST(i AS INT)])
             |      AS rv
             |  FROM ranked_assign ra
             |  JOIN vecs v ON v.vec_id = ra.vec_id
             |  JOIN icents ic ON ic.cid = ra.cid
             |  WHERE ra.rn <= 2 AND ra.vec_id BETWEEN 100 AND 104),
             |lut AS MATERIALIZED (
             |  SELECT q.qid, q.cid AS pcid, sc.sub, sc.cid AS code,
             |    list_inner_product(sc.cvec, sc.cvec)
             |      - 2 * list_inner_product(
             |          q.rv[CAST(sc.sub*16+1 AS INT):
             |              CAST((sc.sub+1)*16 AS INT)],
             |          sc.cvec) AS d
             |  FROM qres q CROSS JOIN subcents sc),
             |qn AS (SELECT qid, cid AS pcid,
             |         list_inner_product(rv, rv) AS qn2
             |       FROM qres),
             |scored AS (
             |  SELECT q.qid AS query_id, r.vec_id AS neighbor_id,
             |    qn.qn2 + (((l0.d + l1.d) + l2.d) + l3.d) AS dist
             |  FROM resid r
             |  JOIN qres q ON q.cid = r.cid AND r.vec_id <> q.qid
             |  JOIN enc e0 ON e0.vec_id = r.vec_id AND e0.sub = 0
             |  JOIN enc e1 ON e1.vec_id = r.vec_id AND e1.sub = 1
             |  JOIN enc e2 ON e2.vec_id = r.vec_id AND e2.sub = 2
             |  JOIN enc e3 ON e3.vec_id = r.vec_id AND e3.sub = 3
             |  JOIN lut l0 ON l0.qid = q.qid AND l0.pcid = q.cid
             |    AND l0.sub = 0 AND l0.code = e0.code
             |  JOIN lut l1 ON l1.qid = q.qid AND l1.pcid = q.cid
             |    AND l1.sub = 1 AND l1.code = e1.code
             |  JOIN lut l2 ON l2.qid = q.qid AND l2.pcid = q.cid
             |    AND l2.sub = 2 AND l2.code = e2.code
             |  JOIN lut l3 ON l3.qid = q.qid AND l3.pcid = q.cid
             |    AND l3.sub = 3 AND l3.code = e3.code
             |  JOIN qn ON qn.qid = q.qid AND qn.pcid = q.cid),
             |adc AS (
             |  SELECT query_id, neighbor_id,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS crank
             |  FROM scored),
             |refined AS (
             |  SELECT a.query_id, a.neighbor_id,
             |    list_inner_product(
             |      list_transform(range(1, len(qv.v) + 1),
             |        i -> qv.v[CAST(i AS INT)] - cv.v[CAST(i AS INT)]),
             |      list_transform(range(1, len(qv.v) + 1),
             |        i -> qv.v[CAST(i AS INT)] - cv.v[CAST(i AS INT)]))
             |      AS dist
             |  FROM adc a
             |  JOIN vecs qv ON qv.vec_id = a.query_id
             |  JOIN vecs cv ON cv.vec_id = a.neighbor_id
             |  WHERE a.crank <= 12),
             |ranked AS (
             |  SELECT query_id, neighbor_id, dist,
             |    CAST(row_number() OVER (PARTITION BY query_id
             |      ORDER BY dist ASC, neighbor_id ASC) AS INT) AS rank
             |  FROM refined)
             |SELECT query_id, rank, neighbor_id, dist
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""
        .stripMargin)),

    // zstd content-coding, built in (Http.parseHttpResponses → the
    // classpath's zstd-jni, the reference libzstd binding) — closes
    // the once-open brotli/zstd seam from the other side: Common Crawl
    // and modern origins increasingly serve content-encoding: zstd.
    // Goldens are `zstd -19` reference-encoder frames: a plain frame,
    // a skippable-frame prologue (RFC 8878 §3.1.2 — decoders skip it),
    // two concatenated frames (output concatenates), and a
    // valid-magic-then-garbage frame → NULL body with headers intact.
    Q("q172_http_zstd",
      (s, dir) => {
        import s.implicits._
        val crlf = "\r\n"
        val head = "HTTP/1.1 200 OK" + crlf +
          "Content-Type: text/html" + crlf +
          "Content-Encoding: zstd" + crlf + crlf
        val rows = Seq(
          (1L, "KLUv/QRo1QAAmHpzdGQgYm9keSBjb250ZW50IHoBAHWlMwyv634d"),
          (2L, "UCpNGAQAAABTS0lQKLUv/QRoVQEA8DxodG1sPjxib2R5PnpzdGQg" +
            "b3ZlciBodHRwPC88LwMAvRQCRQkGr+kEcuve1w=="),
          (3L, "KLUv/QRoYQAAZmlyc3QgZnJhbWUgmQ2Juii1L/0EaGEAAHNlY29u" +
            "ZCBmcmFtZRdkB7Y="),
          (4L, "KLUv/f//////"))
        val df = rows.toDF("media_id", "b64")
          .select(col("media_id"),
            concat(lit(head).cast(BinaryType),
              unbase64(col("b64"))).as("payload"))
        graft.sources.Http.parseHttpResponses(df)
          .select(col("media_id"), col("http_status"),
            col("content_encoding"),
            col("body").cast(StringType).as("body_str"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 200, 'zstd',
             |   repeat('zstd body content ', 8)),
             |  (CAST(2 AS BIGINT), 200, 'zstd',
             |   repeat('<html><body>zstd over http</body></html>', 3)),
             |  (CAST(3 AS BIGINT), 200, 'zstd', 'first frame second frame'),
             |  (CAST(4 AS BIGINT), 200, 'zstd', NULL)
             |) t(media_id, http_status, content_encoding, body_str)
             |ORDER BY media_id""".stripMargin)),

    // PNG dHash via the DECODE rung (Png.imageDhashPng): real crawl
    // images are overwhelmingly compressed — the pure-JVM PNG decoder
    // (JDK Inflater, all five defilters, multi-IDAT, CRC-checked
    // critical chunks) feeds the SAME 9x8 dHash as the expression
    // path, in a mapPartitions narrow map. The synth corpus encodes
    // the q166 pixel formula across ALL FIVE 8-bit color types
    // (pmod 5: RGB / RGBA / grayscale / identity-PLTE palette /
    // gray+alpha — same pixels whatever the type; filters cycle y%5
    // inside every image; pmod 4 = 2 splits IDAT, = 3 inserts an
    // ancillary tEXt chunk; pmod 11 = 6 garbage -> NULL; pmod 10 = 1
    // one-pixel near-dup plant), so the oracle recomputes every bit
    // as id arithmetic — IDENTICAL to q166's, container-agnostic by
    // construction. dhash rides as STRING (the q166 nullable-int64 ->
    // float64 lesson).
    Q("q173_image_dhash_png",
      (s, dir) => graft.multimodal.Png.imageDhashPng(
          graft.multimodal.Png.synthPngImageBytes(
            t(s, dir, "documents").select("doc_id"), "doc_id"))
        .select(col("media_id"), col("dhash").cast(StringType).as("dhash"))
        .orderBy("media_id"),
      Some("""WITH ids AS (SELECT doc_id FROM documents),
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
             |SELECT doc_id AS media_id,
             |  CASE WHEN ((doc_id % 11) + 11) % 11 = 6 THEN NULL
             |    ELSE CAST(CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS VARCHAR)
             |  END AS dhash
             |FROM h ORDER BY media_id""".stripMargin)),

    // Mixed-container perceptual dedup — ONE banding run consumes
    // signatures from BOTH rungs (expression dHash over BMP/ICO ids
    // < 300, decode-rung dHash over PNG ids 300..599): ids congruent
    // mod 256 render identical pixels whatever the container OR codec,
    // so cross-format content dups (e.g. BMP 44 vs PNG 556) surface
    // next to the within-format near-dup plants. The oracle is q167's
    // id arithmetic over the union range — container-agnostic by
    // construction, which is exactly the point.
    Q("q174_image_neardup_mixed",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
        val bmp = graft.multimodal.Multimodal.imageDhashFast(
            graft.multimodal.Multimodal.synthDhashImageBytes(
              docs.where(col("doc_id") < 300), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        val png = graft.multimodal.Png.imageDhashPng(
            graft.multimodal.Png.synthPngImageBytes(
              docs.where(col("doc_id").between(300, 599)), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        Dedup.simhashBandedDups(
          graft.Graft.snap(bmp.unionByName(png)), "id", 64, 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |            WHERE doc_id < 600),
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
             |  FROM bits GROUP BY doc_id),
             |hh AS (
             |  SELECT doc_id,
             |    CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS dh
             |  FROM h
             |  WHERE ((doc_id % 11) + 11) % 11 <> 6)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
             |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.dh, b.dh)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // WAV-PCM frame-energy fingerprint (Audio.audioEnergyFingerprint):
    // the dHash treatment for audio — 65 frames over the 16-bit sample
    // stream, energy = sum(|s|), bit f = energy(f+1) > energy(f), so
    // amplitude scaling (volume normalization, the common audio
    // near-dup) is signature-invariant. Expression-only: one hex pass,
    // the avMetadata chunk walk (LIST chunks skipped), two nested HOFs
    // (plan O(1) in frames AND samples). Plants: pmod 11 = 6 garbage,
    // pmod 13 = 5 declared-size truncation (both NULL), pmod 10 = 1
    // the x2-scaled near-dup of id-1. The oracle recomputes every
    // sample, frame energy, and bit as id arithmetic (HUGEINT combine
    // for bit 63; afp rides as STRING — the q166 float64 lesson).
    // r19: the synth cycles all FOUR containers on pmod(eid,9) —
    // 16-bit, 8-bit (=4), 32-bit IEEE float (=2, fmt 3), 24-bit (=7)
    // — with float/24-bit carrying the SAME integer values as 16-bit,
    // so this oracle verifies the new decode paths UNCHANGED (an
    // encode or decode bug in either container breaks the hash).
    Q("q175_audio_fingerprint",
      (s, dir) => graft.multimodal.Audio.audioEnergyFingerprint(
          graft.multimodal.Audio.synthWavPcmBytes(
            t(s, dir, "documents").select("doc_id")
              .where(col("doc_id") < 800), "doc_id"))
        .select(col("media_id"), col("afp").cast(StringType).as("afp"))
        .orderBy("media_id"),
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |            WHERE doc_id < 800),
             |par AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 10) + 10) % 10 = 1
             |      THEN doc_id - 1 ELSE doc_id END AS eid,
             |    ((doc_id % 10) + 10) % 10 = 1 AS plant,
             |    ((doc_id % 11) + 11) % 11 = 6 AS garbage,
             |    ((doc_id % 13) + 13) % 13 = 5 AS trunc
             |  FROM ids),
             |pn AS (SELECT *, 130 + ((eid * 7) % 66 + 66) % 66 AS n
             |       FROM par),
             |samp AS (
             |  SELECT p.doc_id, p.n, i.i AS i,
             |    (CASE WHEN p.plant THEN 2 ELSE 1 END) *
             |      (CASE WHEN ((p.eid % 9) + 9) % 9 = 4
             |        THEN (((p.eid * 31 + i.i * 17) * (p.eid + i.i + 7))
             |          % 127 + 127) % 127 - 63
             |        ELSE (((p.eid * 31 + i.i * 17) * (p.eid + i.i + 7))
             |          % 16384 + 16384) % 16384 - 8192 END)
             |    + CASE WHEN p.plant AND i.i = 0 THEN 1 ELSE 0 END AS s
             |  FROM pn p CROSS JOIN unnest(range(0, 196)) i(i)
             |  WHERE i.i < p.n AND NOT p.garbage AND NOT p.trunc),
             |fe AS (
             |  SELECT doc_id, (i * 65) // n AS f, sum(abs(s)) AS e
             |  FROM samp GROUP BY doc_id, (i * 65) // n),
             |bits AS (
             |  SELECT a.doc_id, CAST(a.f AS INT) AS b,
             |    CASE WHEN nx.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM fe a JOIN fe nx ON nx.doc_id = a.doc_id
             |    AND nx.f = a.f + 1
             |  WHERE a.f < 64),
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
             |  CAST(CAST(CAST(h.hi AS HUGEINT) * 4294967296 + h.lo
             |    - CASE WHEN h.hi >= 2147483648
             |        THEN CAST('18446744073709551616' AS HUGEINT)
             |        ELSE 0 END AS BIGINT) AS VARCHAR) AS afp
             |FROM ids i LEFT JOIN h ON h.doc_id = i.doc_id
             |ORDER BY media_id""".stripMargin)),

    // Audio near-dup CAPSTONE: fingerprints → the SAME 64-bit banded
    // candidate pipeline as text (q102), images (q167), now audio —
    // the volume-normalized plants surface at Hamming <= 1, garbage
    // and truncated rows drop at the NULL filter, and the oracle
    // replays fingerprints as id arithmetic then brute-forces the
    // Hamming join (Σ bucket² on the Spark side, never |audio|²).
    Q("q176_audio_neardup",
      (s, dir) => {
        // the banding composition reads the JVM fingerprint rung
        // (audioEnergyFingerprintFast — AudioSpec pins it bit-identical
        // to the expression pipeline): the interpreted per-sample
        // decode was the whole q176 wall (r19 AudioProbe: 2.8-3.1 s
        // for 2000 clips; the rung decodes them in ~0.1 s). q175 stays
        // the expression exhibit — both oracle-checked (r20, guide §4).
        val sigs = graft.multimodal.Audio.audioEnergyFingerprintFast(
            graft.multimodal.Audio.synthWavPcmBytes(
              t(s, dir, "documents").select("doc_id")
                .where(col("doc_id") < 2000), "doc_id"))
          .where(col("afp").isNotNull)
          .select(col("media_id").as("id"), col("afp").as("simhash"))
        // snap: decode once, band over the snapshot (the q185 class)
        Dedup.simhashBandedDups(graft.Graft.snap(sigs), "id", 64, 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |            WHERE doc_id < 2000),
             |par AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 10) + 10) % 10 = 1
             |      THEN doc_id - 1 ELSE doc_id END AS eid,
             |    ((doc_id % 10) + 10) % 10 = 1 AS plant,
             |    ((doc_id % 11) + 11) % 11 = 6 AS garbage,
             |    ((doc_id % 13) + 13) % 13 = 5 AS trunc
             |  FROM ids),
             |pn AS (SELECT *, 130 + ((eid * 7) % 66 + 66) % 66 AS n
             |       FROM par),
             |samp AS (
             |  SELECT p.doc_id, p.n, i.i AS i,
             |    (CASE WHEN p.plant THEN 2 ELSE 1 END) *
             |      (CASE WHEN ((p.eid % 9) + 9) % 9 = 4
             |        THEN (((p.eid * 31 + i.i * 17) * (p.eid + i.i + 7))
             |          % 127 + 127) % 127 - 63
             |        ELSE (((p.eid * 31 + i.i * 17) * (p.eid + i.i + 7))
             |          % 16384 + 16384) % 16384 - 8192 END)
             |    + CASE WHEN p.plant AND i.i = 0 THEN 1 ELSE 0 END AS s
             |  FROM pn p CROSS JOIN unnest(range(0, 196)) i(i)
             |  WHERE i.i < p.n AND NOT p.garbage AND NOT p.trunc),
             |fe AS (
             |  SELECT doc_id, (i * 65) // n AS f, sum(abs(s)) AS e
             |  FROM samp GROUP BY doc_id, (i * 65) // n),
             |bits AS (
             |  SELECT a.doc_id, CAST(a.f AS INT) AS b,
             |    CASE WHEN nx.e > a.e THEN 1 ELSE 0 END AS bit
             |  FROM fe a JOIN fe nx ON nx.doc_id = a.doc_id
             |    AND nx.f = a.f + 1
             |  WHERE a.f < 64),
             |h AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN b >= 32
             |      THEN CAST(bit AS BIGINT) << (b - 32) ELSE 0 END)
             |      AS BIGINT) AS hi,
             |    CAST(sum(CASE WHEN b < 32
             |      THEN CAST(bit AS BIGINT) << b ELSE 0 END)
             |      AS BIGINT) AS lo
             |  FROM bits GROUP BY doc_id),
             |hh AS (
             |  SELECT doc_id,
             |    CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS fp
             |  FROM h)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
             |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp, b.fp)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // Incremental connected-components maintenance
    // (Dedup.connectedComponentsIncremental): a persisted label table
    // updated with a delta batch — merges across old components, a
    // within-component no-op edge class, and brand-new nodes — WITHOUT
    // a full recompute: the delta reduces to a graph over component
    // representatives, so rounds bound by the DELTA's merge-chain
    // diameter (CorpusOpsSpec pins rounds <= 2 where the corpus chain
    // needs >= 3) and the relabel is one delta-sized broadcast join.
    // Oracle: full recursive-CTE closure over old ∪ delta edges (the
    // q91/q170 pattern) — bit-equality with full recompute IS the
    // correctness statement.
    Q("q177_cc_incremental",
      (s, dir) => {
        val ids = t(s, dir, "documents").select("doc_id")
          .where(col("doc_id") < 500)
        val e0 = ids
          .where(pmod(col("doc_id"), lit(5)) =!= 4 &&
            col("doc_id") + 1 < 500)
          .select(col("doc_id").as("id_a"),
            (col("doc_id") + 1).as("id_b"))
        val e1 = ids.where(pmod(col("doc_id"), lit(25)) === 0)
          .select(col("doc_id").as("id_a"),
            (col("doc_id") + 5).as("id_b"))
          .unionByName(ids.where(pmod(col("doc_id"), lit(40)) === 0)
            .select(col("doc_id").as("id_a"),
              (col("doc_id") + 1000).as("id_b")))
          .unionByName(ids.where(pmod(col("doc_id"), lit(35)) === 0)
            .select(col("doc_id").as("id_a"),
              (col("doc_id") + 2).as("id_b")))
        val labels0 = Dedup.connectedComponents(e0)
        Dedup.connectedComponentsIncremental(labels0, e1)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE ids AS (
             |  SELECT doc_id FROM documents WHERE doc_id < 500),
             |eall AS (
             |  SELECT doc_id AS src, doc_id + 1 AS dst FROM ids
             |  WHERE ((doc_id % 5) + 5) % 5 <> 4 AND doc_id + 1 < 500
             |  UNION ALL
             |  SELECT doc_id, doc_id + 5 FROM ids
             |  WHERE ((doc_id % 25) + 25) % 25 = 0
             |  UNION ALL
             |  SELECT doc_id, doc_id + 1000 FROM ids
             |  WHERE ((doc_id % 40) + 40) % 40 = 0
             |  UNION ALL
             |  SELECT doc_id, doc_id + 2 FROM ids
             |  WHERE ((doc_id % 35) + 35) % 35 = 0),
             |ed AS (
             |  SELECT src, dst FROM eall
             |  UNION
             |  SELECT dst, src FROM eall),
             |reach(id, label) AS (
             |  SELECT src, src FROM ed
             |  UNION
             |  SELECT e.dst, r.label FROM reach r JOIN ed e
             |    ON e.src = r.id)
             |SELECT CAST(id AS BIGINT) AS id,
             |  CAST(min(label) AS BIGINT) AS component
             |FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // Incremental dedup MAINTENANCE capstone — the full production
    // story q117 (admission) and q177 (label maintenance) compose
    // into: a persisted corpus index (band table + CC labels over its
    // candidate pairs) meets a delta batch (new docs + planted copies
    // of indexed docs); delta edges are the REAL collision pairs —
    // delta-vs-index (one band join against the index, the q117 shape)
    // plus within-delta candidates — and connectedComponentsIncremental
    // folds them into the persisted labels at delta-bounded cost.
    // Edges use the full collision pairs, NOT the admission decision's
    // min-collider pointers: a new doc colliding with TWO existing
    // components must MERGE them (the decision output keeps only the
    // min partner and would under-merge — the documented reason the
    // admission gate is not the maintenance input). The oracle replays
    // minhash banding (q117's CTEs) and closes the union graph with a
    // recursive CTE; bit-equality with a full recompute is the
    // operator's spec'd contract.
    Q("q178_incremental_dedup_maintenance",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val existing = docs.where(col("doc_id") < 256)
        val planted = existing.where(col("doc_id") % 16 === 0)
          .withColumn("doc_id", col("doc_id") + 200000)
        val incoming = docs
          .where(col("doc_id") >= 256 && col("doc_id") < 448)
          .unionByName(planted)
        val baseBands = Dedup.lshBands(Dedup.minhashWide(
          Dedup.shingles(existing, "doc_id", "text", 3), "doc_id", 16),
          "doc_id", 16, 4)
        val labels0 = Dedup.connectedComponents(
          Dedup.lshCandidates(baseBands, "doc_id", probeParts = 0))
        val newBands = Dedup.lshBands(Dedup.minhashWide(
          Dedup.shingles(incoming, "doc_id", "text", 3), "doc_id", 16),
          "doc_id", 16, 4)
        val vsIdx = baseBands
          .select(col("doc_id").as("id_a"), col("band"), col("sig"))
          .join(newBands
            .select(col("doc_id").as("id_b"), col("band"), col("sig")),
            Seq("band", "sig"))
          .select("id_a", "id_b").distinct()
        val deltaEdges = vsIdx.unionByName(
          Dedup.lshCandidates(newBands, "doc_id", probeParts = 0))
        Dedup.connectedComponentsIncremental(labels0, deltaEdges)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE raw AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 448
             |  UNION ALL
             |  SELECT doc_id + 200000 AS doc_id, text FROM documents
             |  WHERE doc_id < 256 AND doc_id % 16 = 0),
             |d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM raw),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |h AS (
             |  SELECT doc_id,
             |         ('0x'||substr(md5(shingle),1,14))::BIGINT AS ha,
             |         ('0x'||substr(md5(shingle),17,14))::BIGINT AS hb
             |  FROM sh),
             |mh AS (
             |  SELECT doc_id, CAST(seed AS INT) AS seed,
             |         min((ha + seed*hb) % (1::BIGINT << 56)) AS minhash
             |  FROM h CROSS JOIN range(0,16) r(seed)
             |  GROUP BY doc_id, seed),
             |bands AS MATERIALIZED (
             |  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             |         string_agg(minhash::VARCHAR, '|' ORDER BY seed) AS sig
             |  FROM mh GROUP BY doc_id, CAST(seed // 4 AS INT)),
             |idx AS MATERIALIZED (
             |  SELECT * FROM bands WHERE doc_id < 256),
             |newb AS MATERIALIZED (
             |  SELECT * FROM bands WHERE doc_id >= 256),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
             |  FROM idx a JOIN idx b ON a.band = b.band AND a.sig = b.sig
             |   AND a.doc_id < b.doc_id
             |  UNION
             |  SELECT DISTINCT i.doc_id, n.doc_id
             |  FROM idx i JOIN newb n ON i.band = n.band AND i.sig = n.sig
             |  UNION
             |  SELECT DISTINCT a.doc_id, b.doc_id
             |  FROM newb a JOIN newb b ON a.band = b.band
             |   AND a.sig = b.sig AND a.doc_id < b.doc_id),
             |ed AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
             |reach(id, label) AS (
             |  SELECT src, src FROM ed
             |  UNION
             |  SELECT e2.dst, r.label FROM reach r JOIN ed e2
             |    ON e2.src = r.id)
             |SELECT CAST(id AS BIGINT) AS id,
             |  CAST(min(label) AS BIGINT) AS component
             |FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // Bloom-filter contamination screen (Dedup.contaminationBloom):
    // the eval set compresses into a 32-bits/shingle bloom bitmap that
    // rides as ONE literal array<long>, and the probe is a fully
    // narrow expression over the token array — zero joins, zero
    // shuffles, zero UDFs; the exact q101 join then runs only over the
    // flagged sliver. Hashing is the repo's md5 hash64 seeded per hash
    // index, so the VERDICT is deterministic and the oracle replays
    // it exactly (K-M double hashing off one md5 per shingle — the
    // minhash family's scheme; a naive per-index hash measured 4x
    // slower than the exact join) — as set membership over POSITIONS (bit
    // set <=> position hit by some (eval shingle, hash index)), which
    // sidesteps cross-engine 64-bit shift semantics entirely. Planted
    // eval copies of every 40th train doc guarantee true hits; no
    // false negatives by construction.
    Q("q179_contamination_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id", "text")
        val train = docs.where(col("doc_id") < 400)
        val evalSet = docs.where(col("doc_id").between(400, 439))
          .unionByName(docs
            .where(col("doc_id") < 400 &&
              pmod(col("doc_id"), lit(40)) === 0)
            .select((col("doc_id") + 500000).as("doc_id"), col("text")))
        Dedup.contaminationBloom(train, evalSet, "doc_id", "text")
          .select(col("doc_id"), col("bloom_contaminated"))
          .orderBy("doc_id")
      },
      Some("""WITH train AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id < 400),
             |ev AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE doc_id BETWEEN 400 AND 439
             |  UNION ALL
             |  SELECT doc_id + 500000, text FROM documents
             |  WHERE doc_id < 400 AND doc_id % 40 = 0),
             |edk AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)),
             |    '\s+') AS toks FROM ev),
             |esh AS MATERIALIZED (
             |  SELECT DISTINCT u.s AS shingle
             |  FROM edk CROSS JOIN unnest(list_transform(
             |    range(1, len(edk.toks)-1),
             |    i -> array_to_string(edk.toks[i:i+2], ' '))) u(s)
             |  WHERE len(edk.toks) >= 3),
             |mb AS MATERIALIZED (
             |  SELECT GREATEST(1, (count(*) * 32 + 63) // 64) * 64
             |    AS mbits FROM esh),
             |pos AS MATERIALIZED (
             |  SELECT DISTINCT
             |    (('0x'||substr(md5(e.shingle),1,14))::BIGINT
             |     + r.i * ('0x'||substr(md5(e.shingle),17,14))::BIGINT)
             |      % mb.mbits AS p
             |  FROM esh e CROSS JOIN range(0,8) r(i) CROSS JOIN mb),
             |td AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)),
             |    '\s+') AS toks FROM train),
             |tsh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM td CROSS JOIN unnest(list_transform(
             |    range(1, len(td.toks)-1),
             |    i -> array_to_string(td.toks[i:i+2], ' '))) u(s)
             |  WHERE len(td.toks) >= 3),
             |tpos AS (
             |  SELECT t.doc_id, t.shingle, r.i,
             |    (('0x'||substr(md5(t.shingle),1,14))::BIGINT
             |     + r.i * ('0x'||substr(md5(t.shingle),17,14))::BIGINT)
             |      % mb.mbits AS p
             |  FROM tsh t CROSS JOIN range(0,8) r(i) CROSS JOIN mb),
             |shhit AS (
             |  SELECT t.doc_id, t.shingle,
             |    bool_and(pos.p IS NOT NULL) AS hit
             |  FROM tpos t LEFT JOIN pos ON pos.p = t.p
             |  GROUP BY t.doc_id, t.shingle),
             |dochit AS (
             |  SELECT doc_id, bool_or(hit) AS bloom_contaminated
             |  FROM shhit GROUP BY doc_id)
             |SELECT tr.doc_id,
             |  COALESCE(d.bloom_contaminated, false) AS bloom_contaminated
             |FROM (SELECT DISTINCT doc_id FROM train) tr
             |LEFT JOIN dochit d USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Screened decontamination (Dedup.decontaminateBloom): the q179
    // bloom screen composed into q124's removal — flag at scan speed,
    // exact-join only the flagged sliver, anti-join the hits out.
    // Because the screen has NO false negatives at any minOverlap, the
    // survivors are IDENTICAL to the exact path, so the oracle IS
    // q124's SQL verbatim — the equivalence is the correctness
    // statement, hash-checked every round.
    Q("q180_decontaminate_bloom",
      (s, dir) => Dedup.decontaminateBloom(
        t(s, dir, "documents").where(col("doc_id") % 10 =!= 0),
        t(s, dir, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", "text", 3, 5)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""WITH d AS (
             |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.s AS shingle
             |  FROM d CROSS JOIN unnest(list_transform(range(1, len(d.toks)-1),
             |       i -> array_to_string(d.toks[i:i+2], ' '))) u(s)
             |  WHERE len(d.toks) >= 3),
             |tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 10 <> 0),
             |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 10 = 0),
             |bad AS (
             |  SELECT DISTINCT train_id
             |  FROM (SELECT train_id, eval_id, count(*) AS n_overlap
             |        FROM tr JOIN ev USING (shingle) GROUP BY 1, 2)
             |  WHERE n_overlap >= 5)
             |SELECT doc_id, source FROM documents
             |WHERE doc_id % 10 <> 0
             |  AND doc_id NOT IN (SELECT train_id FROM bad)
             |ORDER BY doc_id""".stripMargin)),

    // CHARACTER-shingle near-dup over an unsegmented-script corpus
    // (Dedup.charShingles + jaccardFromShingles): the synth docs carry
    // ZERO whitespace, so word-shingle dedup sees one giant "token"
    // per doc (< n tokens -> no shingles at all -> total blindness;
    // CorpusOpsSpec pins that negative control). Char 5-grams restore
    // the signal: exactly the 24 planted one-char near-dup pairs (and
    // nothing else - md5-driven chars, no small-modulus aliasing)
    // surface at jaccard >= 0.5. Oracle replays every character, gram,
    // and division.
    Q("q181_char_shingle_dedup",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
          .where(col("doc_id") < 240)
          .select(col("doc_id"), cjkSynthText(col("doc_id")).as("text"))
        Dedup.jaccardFromShingles(
          Dedup.charShingles(docs, "doc_id", "text", 5), "doc_id", 0.5)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH alph AS (SELECT chr(30340)||chr(19968)||chr(26159)||
             |    chr(19981)||chr(20102)||chr(20154)||chr(25105)||
             |    chr(22312)||chr(26377)||chr(20182)||chr(36825)||
             |    chr(20013)||chr(22823)||chr(26469)||chr(19978)||
             |    chr(22269) AS s),
             |ids AS (SELECT doc_id FROM documents WHERE doc_id < 240),
             |par AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 10) + 10) % 10 = 1
             |      THEN doc_id - 1 ELSE doc_id END AS eid,
             |    ((doc_id % 10) + 10) % 10 = 1 AS plant
             |  FROM ids),
             |txt AS (
             |  SELECT p.doc_id,
             |    array_to_string(list_transform(
             |      range(0, 40 + ((p.eid % 20) + 20) % 20),
             |      i -> substr(a.s,
             |        (CASE WHEN p.plant AND i = 0
             |          THEN (('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT + 1) % 16
             |          ELSE ('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT
             |        END) + 1, 1)), '') AS text
             |  FROM par p CROSS JOIN alph a),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.g AS shingle
             |  FROM txt CROSS JOIN unnest(list_transform(
             |    range(1, len(txt.text) - 3),
             |    i -> substr(txt.text, i, 5))) u(g)
             |  WHERE len(txt.text) >= 5),
             |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh
             |          GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    count(*) AS inter
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle
             |    AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id)
             |SELECT id_a, id_b, inter,
             |  inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
             |FROM inter
             |JOIN sizes sa ON sa.doc_id = id_a
             |JOIN sizes sb ON sb.doc_id = id_b
             |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
             |ORDER BY id_a, id_b""".stripMargin)),

    // Script-aware shingle ROUTING (Dedup.shinglesAuto) over a mixed
    // corpus: real English docs route to word 3-grams (unsegmented
    // ratio 0), the synthetic CJK docs (ids +10000) route to char
    // 5-grams (ratio 1.0) - one map-side pass, the choice per row. The
    // oracle routes STATICALLY by construction; a broken ratio or a
    // swapped branch changes every count on the mis-routed side, so
    // the hash check IS the routing check.
    Q("q182_shingle_router",
      (s, dir) => {
        val en = t(s, dir, "documents").select("doc_id", "text")
          .where(col("doc_id") < 150)
        // +10000 in a SEPARATE projection: inside one select, Spark 4's
        // lateral-column-alias resolution binds a col("doc_id") in a
        // later expression to the (doc_id+10000) ALIAS, not the input —
        // the synth would silently run on doc_id+20000
        val cjk = t(s, dir, "documents").select("doc_id")
          .where(col("doc_id") < 240)
          .withColumn("doc_id", col("doc_id") + 10000)
          .select(col("doc_id"), cjkSynthText(col("doc_id")).as("text"))
        Dedup.shinglesAuto(en.unionByName(cjk), "doc_id", "text", 3, 5)
          .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
          .orderBy("doc_id")
      },
      Some("""WITH alph AS (SELECT chr(30340)||chr(19968)||chr(26159)||
             |    chr(19981)||chr(20102)||chr(20154)||chr(25105)||
             |    chr(22312)||chr(26377)||chr(20182)||chr(36825)||
             |    chr(20013)||chr(22823)||chr(26469)||chr(19978)||
             |    chr(22269) AS s),
             |en AS (
             |  SELECT doc_id,
             |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
             |  FROM documents WHERE doc_id < 150),
             |ensh AS (
             |  SELECT DISTINCT doc_id, u.g AS shingle
             |  FROM en CROSS JOIN unnest(list_transform(
             |    range(1, len(en.toks) - 1),
             |    i -> array_to_string(en.toks[i:i+2], ' '))) u(g)
             |  WHERE len(en.toks) >= 3),
             |ids AS (SELECT doc_id + 10000 AS doc_id FROM documents
             |        WHERE doc_id < 240),
             |par AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 10) + 10) % 10 = 1
             |      THEN doc_id - 1 ELSE doc_id END AS eid,
             |    ((doc_id % 10) + 10) % 10 = 1 AS plant
             |  FROM ids),
             |txt AS (
             |  SELECT p.doc_id,
             |    array_to_string(list_transform(
             |      range(0, 40 + ((p.eid % 20) + 20) % 20),
             |      i -> substr(a.s,
             |        (CASE WHEN p.plant AND i = 0
             |          THEN (('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT + 1) % 16
             |          ELSE ('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT
             |        END) + 1, 1)), '') AS text
             |  FROM par p CROSS JOIN alph a),
             |cjsh AS (
             |  SELECT DISTINCT doc_id, u.g AS shingle
             |  FROM txt CROSS JOIN unnest(list_transform(
             |    range(1, len(txt.text) - 3),
             |    i -> substr(txt.text, i, 5))) u(g)
             |  WHERE len(txt.text) >= 5),
             |allsh AS (SELECT * FROM ensh UNION ALL SELECT * FROM cjsh)
             |SELECT doc_id, count(*) AS n_sh
             |FROM allsh GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Unsegmented-script CONTAMINATION (the shingler hook): eval docs
    // are exact copies of train docs (ids +500000, every 12th), the
    // gram definition is char 5-grams via Dedup.charShingles passed
    // through contamination's shingler parameter. Word-shingle
    // contamination finds NOTHING on this corpus (every doc is one
    // token - the blindness q101 would have at a CJK corpus);
    // char-shingling flags every planted copy at full coverage plus
    // the one-char near-dup neighbors at partial overlap. The oracle
    // replays the chars, the grams, the join, and the coverage
    // division.
    Q("q183_cjk_contamination",
      (s, dir) => {
        val base = t(s, dir, "documents").select("doc_id")
          .where(col("doc_id") < 240)
        val train = base.select(col("doc_id"),
          cjkSynthText(col("doc_id")).as("text"))
        // text from the ORIGINAL id, rename after — in one select the
        // lateral-column-alias rule would bind the synth's col("doc_id")
        // to the +500000 alias and the copies would not be copies
        val eval_ = base.where(col("doc_id") % 12 === 0)
          .select(col("doc_id"), cjkSynthText(col("doc_id")).as("text"))
          .withColumn("doc_id", col("doc_id") + 500000)
        Dedup.contamination(train, eval_, "doc_id", "text", 5,
          minOverlap = 5, shingler = Dedup.charShingles)
          .orderBy("train_id", "eval_id")
      },
      Some("""WITH alph AS (SELECT chr(30340)||chr(19968)||chr(26159)||
             |    chr(19981)||chr(20102)||chr(20154)||chr(25105)||
             |    chr(22312)||chr(26377)||chr(20182)||chr(36825)||
             |    chr(20013)||chr(22823)||chr(26469)||chr(19978)||
             |    chr(22269) AS s),
             |ids AS (SELECT doc_id FROM documents WHERE doc_id < 240),
             |par AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 10) + 10) % 10 = 1
             |      THEN doc_id - 1 ELSE doc_id END AS eid,
             |    ((doc_id % 10) + 10) % 10 = 1 AS plant
             |  FROM ids),
             |txt AS (
             |  SELECT p.doc_id,
             |    array_to_string(list_transform(
             |      range(0, 40 + ((p.eid % 20) + 20) % 20),
             |      i -> substr(a.s,
             |        (CASE WHEN p.plant AND i = 0
             |          THEN (('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT + 1) % 16
             |          ELSE ('0x' || substr(md5(p.eid::VARCHAR || '_' ||
             |            i::VARCHAR), 1, 1))::INT
             |        END) + 1, 1)), '') AS text
             |  FROM par p CROSS JOIN alph a),
             |sh AS (
             |  SELECT DISTINCT doc_id, u.g AS shingle
             |  FROM txt CROSS JOIN unnest(list_transform(
             |    range(1, len(txt.text) - 3),
             |    i -> substr(txt.text, i, 5))) u(g)
             |  WHERE len(txt.text) >= 5),
             |tr AS (SELECT doc_id AS train_id, shingle FROM sh),
             |ev AS (SELECT doc_id + 500000 AS eval_id, shingle FROM sh
             |       WHERE doc_id % 12 = 0),
             |evsz AS (SELECT eval_id, count(*) AS eval_shingles
             |         FROM ev GROUP BY eval_id)
             |SELECT t.train_id, t.eval_id, t.n_overlap,
             |  t.n_overlap / z.eval_shingles AS eval_coverage
             |FROM (SELECT train_id, eval_id, count(*) AS n_overlap
             |      FROM tr JOIN ev USING (shingle)
             |      GROUP BY train_id, eval_id) t
             |JOIN evsz z USING (eval_id)
             |WHERE t.n_overlap >= 5
             |ORDER BY train_id, eval_id""".stripMargin)),

    // JPEG dHash via the from-scratch baseline DECODE rung
    // (Jpeg.imageDhashJpeg): the dominant crawl-image codec joins the
    // perceptual-dedup family. The synth corpus is 72x64 FLAT-8x8-block
    // baseline JPEG (DC quant 8 -> coded DC = v-128 exactly, flat-block
    // IDCT shortcut -> decode EXACT despite the lossy codec), cycling
    // all five codec shapes on pmod 5 (gray / 4:4:4 / 4:2:0 / gray+DRI
    // restarts / 4:2:2), APPn+COM skips on pmod 4 = 3, the one-pixel
    // near-dup plant on pmod 10 = 1; pmod 11 = 6 garbage and pmod 13 =
    // 5 PROGRESSIVE (SOF2) both NULL. The dHash grid sample lands on
    // block (gx, gy), so the oracle is q173's id arithmetic with one
    // extra NULL class — container-agnostic by construction.
    Q("q184_image_dhash_jpeg",
      (s, dir) => graft.multimodal.Jpeg.imageDhashJpeg(
          graft.multimodal.Jpeg.synthJpegImageBytes(
            t(s, dir, "documents").select("doc_id"), "doc_id"))
        .select(col("media_id"), col("dhash").cast(StringType).as("dhash"))
        .orderBy("media_id"),
      Some("""WITH ids AS (SELECT doc_id FROM documents),
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
             |SELECT doc_id AS media_id,
             |  CASE WHEN ((doc_id % 11) + 11) % 11 = 6
             |      OR ((doc_id % 13) + 13) % 13 = 5 THEN NULL
             |    ELSE CAST(CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS VARCHAR)
             |  END AS dhash
             |FROM h ORDER BY media_id""".stripMargin)),

    // TRIMODAL perceptual dedup — ONE banding run over signatures from
    // all THREE image rungs: expression dHash (BMP ids < 300), PNG
    // decode rung (300..599), JPEG decode rung (600..899). Ids
    // congruent mod 256 render identical pixels whatever the container
    // OR codec — lossless or lossy — so cross-format content dups
    // (BMP 44 / PNG 556 / JPEG 812) surface in one pass. Oracle is the
    // q167/q174 id arithmetic over the union range with each rung's
    // NULL classes excluded.
    Q("q185_image_neardup_trimodal",
      (s, dir) => {
        val docs = t(s, dir, "documents").select("doc_id")
        val bmp = graft.multimodal.Multimodal.imageDhashFast(
            graft.multimodal.Multimodal.synthDhashImageBytes(
              docs.where(col("doc_id") < 300), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        val png = graft.multimodal.Png.imageDhashPng(
            graft.multimodal.Png.synthPngImageBytes(
              docs.where(col("doc_id").between(300, 599)), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        val jpg = graft.multimodal.Jpeg.imageDhashJpeg(
            graft.multimodal.Jpeg.synthJpegImageBytes(
              docs.where(col("doc_id").between(600, 899)), "doc_id"))
          .where(col("dhash").isNotNull)
          .select(col("media_id").as("id"), col("dhash").as("simhash"))
        // snap: all THREE decode pipelines run once into the snapshot;
        // the banded self-join reads it from both sides (r20 — without
        // truncation the final plan re-derived each family per side:
        // 12 parquet scans, plans/r20/q185_*_before.txt)
        Dedup.simhashBandedDups(
          graft.Graft.snap(bmp.unionByName(png).unionByName(jpg)),
          "id", 64, 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents
             |            WHERE doc_id < 900),
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
             |  FROM bits GROUP BY doc_id),
             |hh AS (
             |  SELECT doc_id,
             |    CAST(CAST(hi AS HUGEINT) * 4294967296 + lo
             |      - CASE WHEN hi >= 2147483648
             |          THEN CAST('18446744073709551616' AS HUGEINT)
             |          ELSE 0 END AS BIGINT) AS dh
             |  FROM h
             |  WHERE ((doc_id % 11) + 11) % 11 <> 6
             |    AND NOT (doc_id >= 600
             |      AND ((doc_id % 13) + 13) % 13 = 5))
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
             |FROM hh a JOIN hh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.dh, b.dh)) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // UNIGRAM tokenizer training (Unigram.train) — the second tokenizer
    // family next to BPE (q157): seed substring scores -> Viterbi-EM
    // rounds (segment under integer scores by fewest-pieces /
    // highest-score / lexicographically-smallest-sequence, recount
    // usage, prune to chars + top-16 multi-char pieces) -> final ranked
    // vocabulary. Hard EM with integer scores ON PURPOSE: soft EM's
    // float likelihoods cannot replay bit-exactly cross-engine; this
    // objective can, so the oracle re-derives every seed score, every
    // winning segmentation (full enumeration + the same 3-way ordering)
    // and both pruning decisions. Exhibit caps (6-char words, 4-char
    // pieces, 150 docs) keep the oracle's segmentation ENUMERATION
    // bounded; the Scala trainer's Viterbi DP has no such caps.
    Q("q186_unigram_train",
      (s, dir) => graft.text.Unigram.train(
          t(s, dir, "documents").where(col("doc_id") < 150)
            .select("text"),
          "text", keepPieces = 16, rounds = 2, maxPieceLen = 4,
          seedSize = 32, maxWordLen = 6)
        .orderBy("rank"),
      Some("""WITH RECURSIVE prep AS (
             |  SELECT lower(text) AS t FROM documents WHERE doc_id < 150),
             |words AS (
             |  SELECT u.w AS word, CAST(count(*) AS BIGINT) AS cnt
             |  FROM prep CROSS JOIN unnest(
             |    regexp_extract_all(prep.t, '[a-z]+')) u(w)
             |  WHERE len(u.w) <= 6
             |  GROUP BY u.w),
             |subs AS (
             |  SELECT substr(w.word, CAST(i.i AS INT), CAST(l.l AS INT))
             |      AS piece,
             |    sum(w.cnt) AS score
             |  FROM words w
             |  CROSS JOIN unnest(range(1, 7)) i(i)
             |  CROSS JOIN unnest(range(1, 5)) l(l)
             |  WHERE i.i + l.l - 1 <= len(w.word)
             |  GROUP BY 1),
             |chars0 AS (SELECT piece, score FROM subs WHERE len(piece) = 1),
             |multi0 AS (
             |  SELECT piece, score FROM subs WHERE len(piece) > 1
             |  ORDER BY score * len(piece) DESC, piece LIMIT 32),
             |vocab0 AS (SELECT * FROM chars0 UNION ALL SELECT * FROM multi0),
             |seg1(word, cnt, pos, path, score) AS (
             |  SELECT word, cnt, 1, []::VARCHAR[], CAST(0 AS BIGINT)
             |  FROM words
             |  UNION ALL
             |  SELECT s.word, s.cnt, s.pos + len(v.piece),
             |    list_append(s.path, v.piece), s.score + v.score
             |  FROM seg1 s JOIN vocab0 v
             |    ON substr(s.word, CAST(s.pos AS INT), len(v.piece))
             |      = v.piece
             |  WHERE s.pos <= len(s.word)),
             |full1 AS (
             |  SELECT word, cnt, path, score,
             |    row_number() OVER (PARTITION BY word
             |      ORDER BY len(path), score DESC, path) AS rn
             |  FROM seg1 WHERE pos = len(word) + 1),
             |use1 AS (
             |  SELECT u.p AS piece, sum(f.cnt) AS usage
             |  FROM full1 f CROSS JOIN unnest(f.path) u(p)
             |  WHERE f.rn = 1
             |  GROUP BY 1),
             |chars1 AS (
             |  SELECT c.piece, COALESCE(u.usage, 0) AS score
             |  FROM chars0 c LEFT JOIN use1 u USING (piece)),
             |multi1 AS (
             |  SELECT piece, usage AS score FROM use1 WHERE len(piece) > 1
             |  ORDER BY usage DESC, piece LIMIT 16),
             |vocab1 AS (SELECT * FROM chars1 UNION ALL SELECT * FROM multi1),
             |seg2(word, cnt, pos, path, score) AS (
             |  SELECT word, cnt, 1, []::VARCHAR[], CAST(0 AS BIGINT)
             |  FROM words
             |  UNION ALL
             |  SELECT s.word, s.cnt, s.pos + len(v.piece),
             |    list_append(s.path, v.piece), s.score + v.score
             |  FROM seg2 s JOIN vocab1 v
             |    ON substr(s.word, CAST(s.pos AS INT), len(v.piece))
             |      = v.piece
             |  WHERE s.pos <= len(s.word)),
             |full2 AS (
             |  SELECT word, cnt, path, score,
             |    row_number() OVER (PARTITION BY word
             |      ORDER BY len(path), score DESC, path) AS rn
             |  FROM seg2 WHERE pos = len(word) + 1),
             |use2 AS (
             |  SELECT u.p AS piece, sum(f.cnt) AS usage
             |  FROM full2 f CROSS JOIN unnest(f.path) u(p)
             |  WHERE f.rn = 1
             |  GROUP BY 1),
             |chars2 AS (
             |  SELECT c.piece, COALESCE(u.usage, 0) AS score
             |  FROM chars0 c LEFT JOIN use2 u USING (piece)),
             |multi2 AS (
             |  SELECT piece, usage AS score FROM use2 WHERE len(piece) > 1
             |  ORDER BY usage DESC, piece LIMIT 16),
             |vocab2 AS (SELECT * FROM chars2 UNION ALL SELECT * FROM multi2)
             |SELECT CAST(row_number() OVER (ORDER BY score DESC, piece)
             |    AS INT) AS rank,
             |  piece, CAST(score AS BIGINT) AS score
             |FROM vocab2 ORDER BY rank""".stripMargin))
  )
}
