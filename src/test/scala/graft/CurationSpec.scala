package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomJoin, Dedup}

/** Corpus-curation operators: duplicated-n-gram fraction (planted
  * overlaps with hand-computed fractions) and the bloom-pruned
  * semi-join (exactness must not depend on bloom quality).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicatedNgramFraction: planted overlap, hand-computed fractions") {
    // doc 1: "a b c d e f"  → 5-grams {a b c d e, b c d e f}
    // doc 2: "a b c d e x"  → 5-grams {a b c d e, b c d e x}
    // doc 3: "p q r s t u v" → 3 grams, none shared
    // doc 4: "w x"          → shorter than n, no grams, absent from output
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e x"),
      (3L, "p q r s t u v"),
      (4L, "w x")).toDF("doc_id", "text")
    val got = Dedup
      .duplicatedNgramFraction(docs, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((3L, 0L, 0.0)))
    assert(!got.contains(4L))
  }

  test("duplicatedNgramFraction: a gram repeated WITHIN a doc counts once") {
    // doc 1 contains "a b" twice; doc 2 once. Both grams of doc 1 are the
    // same gram, distinct'd to one — dup_frac 1.0 for both docs.
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Dedup
      .duplicatedNgramFraction(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4)))
      .toMap
    // doc 1's distinct 2-grams: {a b, b a} — "a b" shared, "b a" not
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((1L, 1L, 1.0)))
  }

  test("bloomPrunedSemiJoin equals the exact semi-join even at fpp=0.5") {
    val big = (0L until 2000L).map(i => (i, i % 7)).toDF("k", "payload")
    val small = Seq(3L, 10L, 500L, 1999L, 4242L).toDF("sk")
    val expected = big
      .join(small.select(col("sk").as("k")), Seq("k"), "leftsemi")
      .as[(Long, Long)]
      .collect()
      .toSet
    // a deliberately terrible bloom (fpp 0.5) must not change the result —
    // false positives die in the residual semi-join
    for (fpp <- Seq(0.5, 0.01)) {
      val got = BloomJoin
        .bloomPrunedSemiJoin(big, "k", small, "sk", expectedItems = 16, fpp = fpp)
        .as[(Long, Long)]
        .collect()
        .toSet
      assert(got === expected, s"fpp=$fpp")
      assert(got.map(_._1) === Set(3L, 10L, 500L, 1999L))
    }
  }

  test("bloomPrunedSemiJoin: null keys never match") {
    val big = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"))
      .toDF("k", "v")
    val small = Seq(1L).toDF("sk")
    val got = BloomJoin
      .bloomPrunedSemiJoin(big, "k", small, "sk", expectedItems = 8)
      .select("v")
      .as[String]
      .collect()
      .toSeq
    assert(got === Seq("a"))
  }

  /** A 60-word natural-English paragraph that passes every Gopher rule. */
  private val goodText: String =
    ("the project began with a simple goal and grew into something larger " +
      "than anyone expected because every person involved chose to work " +
      "with care and that choice mattered more than any single plan they " +
      "could have written down at the start of the effort which is why " +
      "people still talk about the way it came together over those years")

  private def gopherRows(texts: Seq[(Long, String)]) = {
    import graft.functions.TextFunctions
    texts
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        TextFunctions.gopherStats(col("text")).as("st"))
      .select(
        col("doc_id"),
        col("st.*"),
        TextFunctions.gopherKeep(col("st")).as("keep"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
  }

  test("gopher rule pack: a natural-text doc passes; each rule rejects individually") {
    val rows = gopherRows(Seq(
      1L -> goodText,
      // word count: under 50 words
      2L -> "the cat sat with the dog and that was all they did of it",
      // mean word length > 10 (long pseudo-words), stopwords present
      3L -> (Seq.fill(60)("pneumonoultramicroscopics").mkString(" ") +
        " the of and that with have be to"),
      // symbol ratio: '#' every other word
      4L -> Seq.fill(60)("the # of # and # that # with # have #")
        .mkString(" "),
      // bullet lines dominate
      5L -> (Seq.fill(20)("- the bullet item of note").mkString("\n") +
        "\nthe closing line that have with and of to be words here"),
      // ellipsis-ended lines dominate
      6L -> (Seq.fill(20)("the thought trails of and that with...")
        .mkString("\n")),
      // non-alphabetic words dominate
      7L -> (("the of and that have " + Seq.fill(60)("12345").mkString(" "))),
      // empty doc: every ratio null, keep false (not null)
      8L -> ""))
    assert(rows(1L).getAs[Boolean]("keep"), "natural text must pass")
    (2L to 8L).foreach { id =>
      assert(!rows(id).getAs[Boolean]("keep"), s"doc $id must be rejected")
    }
    // each planted doc fails the rule it targets
    assert(rows(2L).getAs[Long]("n_words") < 50L)
    assert(rows(3L).getAs[Double]("mean_word_len") > 10.0)
    assert(rows(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(rows(5L).getAs[Double]("bullet_ratio") > 0.1)
    assert(rows(6L).getAs[Double]("ellipsis_ratio") > 0.3)
    assert(rows(7L).getAs[Double]("alpha_ratio") < 0.8)
    assert(rows(8L).getAs[Long]("n_words") === 0L)
    assert(rows(8L).isNullAt(rows(8L).fieldIndex("alpha_ratio")))
    // the stopword rule: distinct hits, not occurrences
    assert(rows(1L).getAs[Long]("n_stop_hits") >= 2L)
    val only = gopherRows(Seq(9L ->
      Seq.fill(60)("lorem ipsum dolor sit amet").mkString(" ")))
    assert(only(9L).getAs[Long]("n_stop_hits") === 0L)
    assert(!only(9L).getAs[Boolean]("keep"))
  }

  test("gopher/c4 token counts ignore phantom empty tokens from leading newlines/tabs") {
    import graft.functions.TextFunctions
    // "\n" + 49 words: trim strips spaces only, so split would yield a
    // leading "" — n_words must still be 49, not 50
    val words49 = Seq.fill(49)("word").mkString(" ")
    val rows = gopherRows(Seq(1L -> ("\n" + words49), 2L -> words49))
    assert(rows(1L).getAs[Long]("n_words") === 49L)
    assert(rows(1L).getAs[Long]("n_words") ===
      rows(2L).getAs[Long]("n_words"))
    // tab-indented 4-word line must NOT count 5 tokens and survive C4
    val kept = Seq("\tonly four words here.")
      .toDF("text")
      .select(TextFunctions.c4KeptLines(col("text")).as("k"))
      .as[Seq[String]]
      .head()
    assert(kept === Seq.empty[String])
  }

  test("gopherStats fused expression == composable form, bit for bit") {
    import graft.functions.TextFunctions
    // real corpus + adversarial edges: empty, whitespace-only, newline
    // splits with trailing empties, bullets (-, *, •), ellipses (...,
    // …, 4+ dots, end-of-text), '#' runs, mixed-case stopwords, a
    // non-ASCII token, an astral (non-BMP) code point (length() counts
    // code points, not UTF-16 units), and null
    val edges = Seq(
      "", " ", "\n", "\t\n \f\r", "a", "the THE The tHe",
      "- bullet\n* star\n• dot\nplain", "  - spaced bullet  ",
      "ends with...", "ends with…", "....", "...", "#a#b##",
      "wait... no…\nsecond...", "café résumé",
      "emoji 😀 token", "of AND that HAVE with BE to",
      "a...\n...b\n...", "x\n\n\ny", "trailing newline\n",
      // CRLF / exotic-terminator edges (round-17 advice): Java `$`
      // matches before a FINAL \r / \u0085 / \u2028 / \u2029, so a
      // trimmed line ending "...\r" IS an ellipsis line
      "crlf ellipsis line...\r\nnext line", "ends with...\r",
      "ends with…\r", "ellipsis then space... \r", "...\r\r",
      "nel ellipsis...\u0085", "ls ellipsis...\u2028",
      "ps ellipsis...\u2029", "bare\r", "\r", "a.\r\nb...\r\nc\r\n",
      null.asInstanceOf[String])
    val corpus = Tables
      .documents(spark, TestSpark.sf)
      .select(col("text"))
      .as[String]
      .collect()
      .toSeq
    val df = (corpus ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = df.select(
      col("id"),
      TextFunctions.gopherStats(col("text")).as("f"),
      TextFunctions.gopherStatsComposable(col("text")).as("c"))
    // <=> is null-safe; struct equality is field-wise. The fused form
    // yields a NULL struct on null input where the composable yields a
    // struct of null fields — both extract to identical field values,
    // which is what every consumer (q201's select, gopherKeep) does
    val fields = Seq("n_words", "mean_word_len", "symbol_ratio",
      "bullet_ratio", "ellipsis_ratio", "alpha_ratio", "n_stop_hits")
    val diff = both
      .where(!fields
        .map(f => col(s"f.$f") <=> col(s"c.$f"))
        .reduce(_ && _))
      .count()
    assert(diff === 0L)
  }

  test("tokenWindowHashes fused expression == composable form, element for element") {
    import graft.functions.TokenWindowHashesExpr
    val edges = Seq(
      "", " ", "\t", "a", "a b c d", "a b c d e",
      "a b c d e f g h", "a  b   c\td e f", "\ta b c d e f\n",
      "same same same same same same", "café résumé naïve piñata jalapeño",
      "x\n\ny z w v u", null.asInstanceOf[String])
    val corpus = Tables
      .documents(spark, TestSpark.sf)
      .select(col("text"))
      .as[String]
      .collect()
      .toSeq
    val df = (corpus ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 2, 5)) {
      val fused = df.select(
        col("id"),
        TokenWindowHashesExpr.ofColumn(col("text"), n).as("f"))
      val comp = TokenWindowHashesExpr.composableFrame(df, "id", "text", n)
      val diff = fused
        .join(comp, Seq("id"))
        .where(!(col("f") <=> col("gh")))
        .count()
      assert(diff === 0L, s"n=$n")
    }
  }

  test("c4KeptLines fused expression == composable form, element for element") {
    import graft.functions.TextFunctions
    val edges = Seq(
      "", " ", "\n", "line with five words here.\n  padded five word line too!  ",
      "only four words here.", "ends without punct five words",
      "JavaScript mention with five words.", "jAvAsCrIpT five word line kept?",
      "ends in quote with five words\"", "ends in apostrophe five words'",
      "tab\tseparated five word line here.", "trailing newline keeps empty\n",
      "no javascript but javascriptish five words.",
      "unicode café line with five words.", "emoji 😀 line with five words!",
      // CRLF / exotic-terminator edges (round-17 advice): Java `$`
      // matches before a FINAL \r / \u0085 / \u2028 / \u2029, so a
      // CRLF document's punctuated lines are KEPT by the composable
      // form and must be kept by the fused form too
      "crlf line with five words.\r\nsecond crlf line five words!\r\n",
      "good crlf sentence here five words.\r", "short.\r",
      "nel line with five words.\u0085", "ls line with five words.\u2028",
      "ps line with five words.\u2029", "double cr five words here.\r\r",
      "punct after cr five words.\r.", "space after dot five words. \r",
      null.asInstanceOf[String])
    val corpus = Tables
      .documents(spark, TestSpark.sf)
      .select(col("text"))
      .as[String]
      .collect()
      .toSeq
    val df = (corpus ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val diff = df
      .select(
        col("id"),
        TextFunctions.c4KeptLines(col("text")).as("f"),
        TextFunctions.c4KeptLinesComposable(col("text")).as("c"))
      .where(!(col("f") <=> col("c")))
      .count()
    assert(diff === 0L)
  }

  test("wordGramHashes fused expression == composable form, element for element") {
    import graft.functions.WordGramHashesExpr
    // the adversarial edges the tokenize/split parity depends on:
    // leading/trailing non-space whitespace (phantom empty tokens),
    // multi-space and tab separators (non-contiguous grams that force
    // the copy path), repeated grams (first-occurrence distinct order),
    // single-token and sub-n docs, unicode tokens, and null
    val edges = Seq(
      "", " ", "\t", "\n", "a", "a b", "a b c d e",
      "a b c d e f g", "a  b   c d e f", "\ta b c d e f",
      "a b c d e f\t", "a\tb\nc d e f", "a b a b a b a b",
      "same same same same same same",
      "café résumé naïve piñata jalapeño über",
      "emoji 😀 in a five gram line", "x\n\ny z w v u",
      null.asInstanceOf[String])
    val corpus = Tables
      .documents(spark, TestSpark.sf)
      .select(col("text"))
      .as[String]
      .collect()
      .toSeq
    val df = (corpus ++ edges).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 2, 5)) {
      val diff = df
        .select(
          col("id"),
          WordGramHashesExpr.ofColumn(col("text"), n).as("f"),
          WordGramHashesExpr.composable(col("text"), n).as("c"))
        .where(!(col("f") <=> col("c")))
        .count()
      assert(diff === 0L, s"n=$n")
      // non-distinct (per-occurrence) form, the q46 bigram shape
      val diffAll = df
        .select(
          col("id"),
          WordGramHashesExpr.ofColumnAll(col("text"), n).as("f"),
          WordGramHashesExpr.composableAll(col("text"), n).as("c"))
        .where(!(col("f") <=> col("c")))
        .count()
      assert(diffAll === 0L, s"all, n=$n")
    }
  }

  test("c4KeptLines: terminal punctuation, 5-word minimum, javascript drop, order kept") {
    import graft.functions.TextFunctions
    val page = Seq(
      "This sentence survives the filter with ease.",  // kept
      "short line.",                                   // <5 words
      "no terminal punctuation on this line here",     // no punct
      "Enable javascript to view this fancy page.",    // javascript
      "Does a question also survive the cleaning?",    // kept
      "\"Quoted endings count as terminal marks too\"" // kept (quote)
    ).mkString("\n")
    val got = Seq(page)
      .toDF("text")
      .select(TextFunctions.c4KeptLines(col("text")).as("k"))
      .as[Seq[String]]
      .head()
    assert(got === Seq(
      "This sentence survives the filter with ease.",
      "Does a question also survive the cleaning?",
      "\"Quoted endings count as terminal marks too\""))
    // empty page → empty array, so concat_ws gives '' (the q202
    // clean_text contract the oracle coalesces to)
    val empty = Seq("")
      .toDF("text")
      .select(TextFunctions.c4KeptLines(col("text")).as("k"))
      .as[Seq[String]]
      .head()
    assert(empty === Seq.empty[String])
  }

  private def extract(html: String, minLen: Int = 25, maxPct: Int = 30)
      : (Long, Long, String) = {
    val r = Seq(html)
      .toDF("html")
      .select(
        graft.functions.HtmlExtract
          .mainContent(col("html"), minLen, maxPct)
          .as("st"))
      .select(col("st.n_blocks"), col("st.n_kept"), col("st.main_text"))
      .as[(Long, Long, String)]
      .head()
    r
  }

  test("htmlExtract: article body survives; nav/footer/head/script/style/comments drop") {
    val html =
      """<html><head><title>Great Title That Is Quite Long Indeed</title>
        |<style>body { color: red; } .nav{display:none}</style>
        |<script>var secretTracker = "do-not-leak"; </script></head>
        |<body>
        |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">Archive pages</a></li></ul></nav>
        |<!-- boilerplate chrome above; do-not-leak either -->
        |<div id="main">
        |<h1>Short head</h1>
        |<p>The first paragraph of the article carries plenty of real
        |sentence text and even an inline <a href="/ref">reference link</a>
        |without tipping the density bar.</p>
        |<p>The second paragraph is also long enough to clear the minimum
        |length heuristic comfortably.</p>
        |</div>
        |<footer><a href="/privacy">Privacy policy</a> — <a href="/tos">All the terms of service</a></footer>
        |</body></html>""".stripMargin
    val (_, nKept, text) = extract(html)
    assert(nKept === 2L)
    val blocks = text.split("\n").toSeq
    assert(blocks.size === 2)
    assert(blocks.head.startsWith("The first paragraph"))
    // inline anchor TEXT stays (it is content); tags are gone
    assert(blocks.head.contains("reference link"))
    assert(!text.contains("<"))
    // non-content text never leaks: title, css, js, comments, nav, footer
    Seq("Great Title", "color: red", "do-not-leak", "Home",
      "Archive pages", "Privacy policy", "terms of service", "Short head")
      .foreach(s => assert(!text.contains(s), s"leaked: $s"))
  }

  test("htmlExtract: link-dense block drops even when long; same text without links survives") {
    val links = (1 to 8)
      .map(i => s"""<a href="/p$i">related article number $i</a>""")
      .mkString(" · ")
    val plain = (1 to 8).map(i => s"related article number $i").mkString(" · ")
    val kept = extract(s"<p>$plain</p>")
    val dropped = extract(s"<p>$links</p>")
    assert(kept._2 === 1L && kept._3 === plain)
    assert(dropped._2 === 0L && dropped._3 === "")
  }

  test("htmlExtract: entities decode once, escaped markup stays text, nbsp collapses") {
    val html = "<p>Fish &amp; chips &#39;menu&#39; shows &lt;b&gt;bold&lt;/b&gt; " +
      "markup&nbsp;&nbsp;inline and the literal string &amp;lt; too.</p>"
    val (_, _, text) = extract(html)
    assert(text ===
      "Fish & chips 'menu' shows <b>bold</b> markup inline and the literal string &lt; too.")
  }

  test("htmlExtract: <header> is not eaten by the <head> strip; composes with c4KeptLines") {
    val html = "<header>A site banner with some words in it here.</header>" +
      "<p>This sentence is long enough and ends with terminal punctuation.</p>" +
      "<p>no terminal punctuation on this long enough line</p>"
    val (_, nKept, text) = extract(html)
    // header text survives the head-region strip (boundary check) and
    // clears both heuristics — it is a block like any other
    assert(nKept === 3L)
    assert(text.startsWith("A site banner"))
    // downstream C4 line filter then drops the unpunctuated lines
    import graft.functions.TextFunctions
    val c4 = Seq(text)
      .toDF("text")
      .select(TextFunctions.c4KeptLines(col("text")).as("k"))
      .as[Seq[String]]
      .head()
    assert(c4 === Seq(
      "A site banner with some words in it here.",
      "This sentence is long enough and ends with terminal punctuation."))
  }

  test("htmlExtract: all five q204 chrome shape families strip around the same body") {
    // the q204/q210 corpus chrome variants (link-list nav, link table,
    // nested list with unclosed <li>s + entity edge cases, sidebar
    // with an unclosed <div> + truncated document, comment/br/hr
    // banner) — the content must survive IDENTICALLY under each, and
    // chrome link text must never leak
    val body =
      "<div class=\"content\"><h1>Document 7</h1>" +
        "<p>The first paragraph of the planted document carries plenty " +
        "of real sentence text for the length heuristic.</p>" +
        "<p>The second paragraph is also long enough to clear the " +
        "minimum comfortably.</p></div>"
    val expected =
      "The first paragraph of the planted document carries plenty of " +
        "real sentence text for the length heuristic.\n" +
        "The second paragraph is also long enough to clear the minimum " +
        "comfortably."
    val chromeLinkText = Seq(
      "Home", "Archive", "Tags", "Search", "Log in", "Register",
      "Alpha", "Beta", "Gamma", "Top", "New", "Best", "RSS", "Donate",
      "Mirror", "Accessibility", "Sitemap", "Privacy", "Contact")
    SparkEntry.htmlChromePre.indices.foreach { v =>
      val page =
        SparkEntry.htmlChromePre(v) + body + SparkEntry.htmlChromePost(v)
      val (_, _, text) = extract(page)
      val content = text.split("\n").filter(_.startsWith("The ")).mkString("\n")
      assert(content === expected, s"variant $v content")
      chromeLinkText.foreach(s =>
        assert(!text.contains(s), s"variant $v leaked chrome: $s"))
    }
    // variant 2's prose footer is the DOCUMENTED exception: it passes
    // the block filter (low link density, long enough) — realistic
    // extraction noise that q210's C4 line rule then drops
    val v2 = SparkEntry.htmlChromePre(2) + body + SparkEntry.htmlChromePost(2)
    val (_, nKept2, text2) = extract(v2)
    assert(nKept2 === 3L)
    assert(text2.contains("synthetic corpus builder"))
    import graft.functions.TextFunctions
    val c4 = Seq(text2)
      .toDF("text")
      .select(TextFunctions.c4KeptLines(col("text")).as("k"))
      .as[Seq[String]]
      .head()
    assert(!c4.exists(_.contains("synthetic corpus builder")))
    assert(c4.size === 2)
  }

  private def piiAudit(text: String): (Seq[Long], String) = {
    val r = Seq(text)
      .toDF("t")
      .select(graft.functions.Pii.redactAudit(col("t")).as("st"))
      .select(
        col("st.n_email"), col("st.n_iban"), col("st.n_cc"),
        col("st.n_ssn"), col("st.n_phone"), col("st.n_ip"),
        col("st.n_num"), col("st.redacted"))
      .head()
    (Seq(0, 1, 2, 3, 4, 5, 6).map(r.getLong), r.getString(7))
  }

  test("pii: every rule fires once on a kitchen-sink row; tokens replace in order") {
    val (counts, red) = piiAudit(
      "Mail a.user+tag@sub.example.org, IBAN DE44500105175407324931, " +
        "card 4111 1111 1111 1111, SSN 123-45-6789, call +1 (555) 010-4242, " +
        "host 10.0.255.7, and 42 apples.")
    assert(counts === Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(red ===
      "Mail <EMAIL>, IBAN <IBAN>, card <CC>, SSN <SSN>, call <PHONE>, " +
        "host <IP>, and <NUM> apples.")
  }

  test("pii: per-stage counts never double-count digits inside earlier redactions") {
    // the email's digits, the card's digits, the SSN's digits must NOT
    // reappear in n_phone / n_ip / n_num
    val (counts, red) = piiAudit("u123@x.io 4111 1111 1111 1111 123-45-6789")
    assert(counts === Seq(1L, 0L, 1L, 1L, 0L, 0L, 0L))
    assert(red === "<EMAIL> <CC> <SSN>")
    // an IP alone is not a phone (the phone format needs 3-4 digit
    // tails the dotted quad never provides)
    val (ipOnly, redIp) = piiAudit("ping 192.168.0.7 now")
    assert(ipOnly === Seq(0L, 0L, 0L, 0L, 0L, 1L, 0L))
    assert(redIp === "ping <IP> now")
  }

  test("pii: digit-run catch-all picks up what the structured rules skip") {
    val (counts, red) = piiAudit("order 98765 shipped in 3 days")
    assert(counts === Seq(0L, 0L, 0L, 0L, 0L, 0L, 2L))
    assert(red === "order <NUM> shipped in <NUM> days")
  }
}
