package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Wave-five cleaning/normalization queries: corpus-WIDE line dedup
  * (q180), Unicode NFC normalization through the native expression
  * (q181). Pseudo-lines are synthesized q139-style (the corpus has no
  * newlines); non-ASCII content is synthesized from explicit \\uXXXX
  * escape constants — never literal glyphs — so no editor/toolchain can
  * silently re-normalize the decomposed fixtures into composed form.
  */
object CleanseQueries {

  // U+00E9 precomposed e-acute; combining marks U+0300 grave, U+0301
  // acute, U+0302 circumflex, U+0303 tilde, U+0308 diaeresis, U+0327
  // cedilla. Six DECOMPOSED base+mark picks plus one PRECOMPOSED pick
  // (the changed=0 case).
  private val EAcute = "\u00e9"
  private val Picks: Seq[String] = Seq(
    "e\u0301", "a\u0300", "o\u0302", "u\u0308", "n\u0303", EAcute, "c\u0327")

  def defs: Seq[QueryDef] = Seq(

    // ---- corpus-wide line dedup -----------------------------------------
    // The CCNet/MassiveText cross-document paragraph-dedup step: one
    // md5-keyed min() election over (doc_id, line-index) packed
    // positions, fixed-width join back, per-doc HOF rebuild (text never
    // shuffles). Planted boilerplate: a per-`source` subscribe prompt
    // (cross-doc within a source) and a global cookie banner in two
    // casings (corpus-global + within-doc normalized dup), so the
    // election has real work at all three scopes. The oracle replays
    // the identical election.
    QueryDef.sqlBacked(
      "q180_corpus_line_dedup",
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents),
        |l0 AS (SELECT doc_id, source,
        |  [array_to_string(toks[(i*6+1):(i*6+6)], ' ')
        |    FOR i IN range(0, CAST(floor((len(toks)-1)/6) AS BIGINT) + 1)] AS ls0
        |  FROM t),
        |l2 AS (SELECT doc_id, list_concat(
        |    list_prepend('Subscribe to ' || source || ' updates', ls0),
        |    ['Accept all cookies', 'accept all cookies']) AS ls FROM l0),
        |lines AS (SELECT doc_id, unnest(ls) AS line,
        |  CAST(unnest(range(0, len(ls))) AS BIGINT) AS idx FROM l2),
        |cand AS (SELECT doc_id, idx, md5(lower(trim(line))) AS k,
        |    doc_id*1048576 + idx AS packed
        |  FROM lines WHERE lower(trim(line)) <> ''),
        |firsts AS (SELECT k, min(packed) AS fp FROM cand GROUP BY k),
        |drops AS (SELECT c.doc_id, c.idx FROM cand c
        |  JOIN firsts f ON f.k = c.k WHERE c.packed <> f.fp),
        |kept AS (SELECT l.doc_id, l.idx, l.line FROM lines l
        |  ANTI JOIN drops d ON d.doc_id = l.doc_id AND d.idx = l.idx),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY idx) AS txt
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
        |SELECT tot.doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(coalesce(txt, '')) AS dedup_md5
        |FROM tot LEFT JOIN agg ON agg.doc_id = tot.doc_id""".stripMargin) {
      (s, d) =>
      val toks = split(col("text"), " ")
      val ls0 = transform(
        sequence(lit(0L), floor((size(toks) - lit(1)) / lit(6)).cast("long")),
        i => array_join(slice(toks, (i * 6 + 1).cast("int"), lit(6)), " "))
      val ls = concat(
        array(concat(lit("Subscribe to "), col("source"), lit(" updates"))),
        ls0,
        array(lit("Accept all cookies"), lit("accept all cookies")))
      Dedup.dedupLinesAcross(
          Tables.documents(s, d).select(col("doc_id"),
            array_join(ls, "\n").as("synth")),
          "doc_id", "synth")
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("text_dedup").cast("binary")).as("dedup_md5"))
    },

    // ---- Unicode NFC normalization --------------------------------------
    // The native nfc_normalize expression (graft.plans.NfcNormalize) vs
    // DuckDB's builtin nfc_normalize — two independent UAX #15
    // implementations (utf8proc vs the JVM) agreeing byte-for-byte.
    // Per-doc synthesis appends an always-PRECOMPOSED token and a pick
    // chosen by doc_id % 7, so changed=0 rows (precomposed pick) and
    // changed=1 rows (six decomposed picks) both occur. Every
    // decomposed pick composes to a single precomposed codepoint, so
    // changed rows show n_before - n_after = 1 exactly and unchanged
    // rows 0 — the length delta is itself an oracle-checked invariant.
    QueryDef.sqlBacked(
      "q181_nfc_normalize",
      s"""WITH aug AS (SELECT doc_id,
         |    substr(text, 1, 48) || ' caf$EAcute ' ||
         |    [${Picks.map(p => s"'$p'").mkString(",")}]
         |      [CAST(doc_id % 7 AS INT) + 1] AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(s) AS BIGINT) AS n_before,
         |  CAST(length(nfc_normalize(s)) AS BIGINT) AS n_after,
         |  CAST(s <> nfc_normalize(s) AS BIGINT) AS changed,
         |  md5(nfc_normalize(s)) AS norm_md5
         |FROM aug""".stripMargin) { (s, d) =>
      val pick = element_at(array(Picks.map(lit): _*),
        (col("doc_id") % 7 + 1).cast("int"))
      val aug = concat(substring(col("text"), 1, 48),
        lit(s" caf$EAcute "), pick)
      val norm = graft.functions.TextAnalysis.nfcNormalize(col("s"))
      Tables.documents(s, d)
        .select(col("doc_id"), aug.as("s"))
        .select(col("doc_id"),
          length(col("s")).cast("long").as("n_before"),
          length(norm).cast("long").as("n_after"),
          (norm =!= col("s")).cast("long").as("changed"),
          md5(norm.cast("binary")).as("norm_md5"))
    },

    // ---- domain blocklist with subdomain matching -----------------------
    // The UT1-style URL-blocklist gate (C4/RefinedWeb/FineWeb all run
    // one): hosts are synthesized per doc from (doc_id % 4) subdomain
    // prefixes x (doc_id % 20) bases x (doc_id % 3) TLDs, the blocklist
    // mixes registrable domains (block all subdomains) and one explicit
    // subdomain entry; the operator meets them via suffix-chain explode
    // + BROADCAST equi-join (plan-asserted), the oracle via a literal
    // list_contains filter over the same suffix chain.
    QueryDef.sqlBacked(
      "q182_domain_blocklist",
      s"""WITH h AS (SELECT doc_id,
         |    ['ads.','www.','cdn.media.',''][CAST(doc_id % 4 AS INT) + 1]
         |    || 'ex' || CAST(doc_id % 20 AS VARCHAR) || '.'
         |    || ['com','org','net'][CAST(doc_id % 3 AS INT) + 1] AS host
         |  FROM documents),
         |sfx AS (SELECT doc_id, host,
         |    [array_to_string(parts[i:], '.')
         |      FOR i IN range(1, len(parts)+1)] AS sfxs
         |  FROM (SELECT doc_id, host, string_split(host, '.') AS parts
         |        FROM h)),
         |m AS (SELECT doc_id, host, list_sort(list_filter(sfxs,
         |    s -> list_contains([${Q182Blocklist.map(e => s"'$e'").mkString(",")}], s))) AS hits
         |  FROM sfx)
         |SELECT doc_id, host,
         |  CAST(len(hits) > 0 AS BIGINT) AS blocked,
         |  coalesce(hits[1], '') AS hit
         |FROM m""".stripMargin) { (s, d) =>
      import s.implicits._
      val host = concat(
        element_at(array(lit("ads."), lit("www."), lit("cdn.media."), lit("")),
          (col("doc_id") % 4 + 1).cast("int")),
        lit("ex"), (col("doc_id") % 20).cast("string"), lit("."),
        element_at(array(lit("com"), lit("org"), lit("net")),
          (col("doc_id") % 3 + 1).cast("int")))
      val docs = Tables.documents(s, d).select(col("doc_id"), host.as("host"))
      graft.functions.UrlOps.blocklistFilter(
          docs, "doc_id", "host", Q182Blocklist.toDF("domain"), "domain")
        .select(col("doc_id"), col("host"), col("blocked"), col("hit"))
    })

  /** q182 blocklist: registrable domains (subdomain-transitive) plus one
    * explicit subdomain entry (media.ex2.org blocks cdn.media.ex2.org
    * but NOT www.ex2.org). */
  private val Q182Blocklist: Seq[String] =
    Seq("ex3.com", "ex7.org", "ex11.net", "ads.ex5.com", "media.ex2.org")
}
