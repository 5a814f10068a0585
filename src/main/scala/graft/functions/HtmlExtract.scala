package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-content text extraction: the stage every real web-corpus
  * pipeline runs BEFORE document filtering (C4, Raffel et al.
  * arXiv:1910.10683 §2.2, explicitly operates on text already extracted
  * from web pages; Gopher's rule pack likewise presupposes extracted
  * text). The reference pipeline analog is the boilerplate-removal
  * heuristic family of jusText / trafilatura: segment markup into
  * block-level units, score each block by its visible-text length and
  * its LINK DENSITY (share of the text living inside anchors), keep the
  * content-shaped blocks, and reassemble them in document order.
  *
  * Everything here is a pure `Column` pipeline over codegen'd builtins
  * (`regexp_replace` / `split` / `regexp_extract_all` / higher-order
  * array ops) — no UDF, no explode, no shuffle: extraction is one
  * narrow projection over the corpus, exactly like the Gopher/C4
  * operators it feeds ([[TextFunctions.gopherStats]],
  * [[TextFunctions.c4KeptLines]]).
  *
  * Every regex is RE2-compatible (no backreferences — the script/style
  * pair is two passes instead of one backreferenced pattern), so a SQL
  * engine on RE2 (the DuckDB oracle) replays the pipeline bit-for-bit.
  */
object HtmlExtract {

  /** Block-level segmentation boundary: any opening OR closing tag of a
    * block-display element splits the page. Inline markup (`<a>`,
    * `<b>`, `<span>`, …) stays INSIDE its block — the link-density
    * score needs the anchors in place.
    */
  val BlockTagPattern: String =
    "(?i)</?(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead" +
      "|tbody|tfoot|tr|td|th|br|hr|section|article|header|footer|nav" +
      "|blockquote|aside|main|figure|figcaption|form|pre)\\b[^>]*>"

  /** Drop the non-content constructs whose INNER text must never leak
    * into extraction: the whole `<head>…</head>` region (title, meta),
    * `<script>…</script>` / `<style>…</style>` anywhere (they also
    * appear in bodies), and comments. One pass per tag instead of a
    * single `<(script|style)>.*?</\1>` — RE2 has no backreferences.
    * `<head\b` cannot prefix-match `<header` (the boundary needs a
    * non-word char after "head").
    */
  def stripNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, "(?is)<head\\b[^>]*>.*?</head\\s*>", " "),
          "(?is)<script\\b[^>]*>.*?</script\\s*>",
          " "),
        "(?is)<style\\b[^>]*>.*?</style\\s*>",
        " "),
      "(?s)<!--.*?-->",
      " ")

  /** Decode the named entities that survive tag stripping. Order
    * matters: `&amp;` decodes LAST so `&amp;lt;` yields the literal
    * text "&lt;" (the page showed an escaped entity), never a second
    * decode round. `&nbsp;` becomes a plain space BEFORE whitespace
    * normalization so it collapses like any other run.
    */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&nbsp;" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&apos;" -> "'",
      "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** Visible text of a markup fragment: strip remaining (inline) tags,
    * decode entities, collapse whitespace, trim. Tag stripping runs
    * FIRST so `&lt;div&gt;` in the source decodes to the literal text
    * "<div>" instead of being eaten as a tag — escaped markup is
    * content.
    */
  def visibleText(markup: Column): Column =
    trim(
      regexp_replace(
        decodeEntities(regexp_replace(markup, "(?s)<[^>]*>", " ")),
        "\\s+",
        " "))

  /** The visible text living inside a fragment's anchors, as one
    * space-joined string — its length against the block's total text
    * length is the link-density score. Lazy `.*?` keeps each anchor's
    * span minimal; `(?s)` lets anchors wrap lines.
    */
  def anchorText(markup: Column): Column =
    visibleText(
      concat_ws(
        " ",
        regexp_extract_all(
          markup,
          lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"),
          lit(1))))

  /** Main-content extraction:
    * `struct(n_blocks, n_kept, main_text)`. A block survives iff its
    * visible text carries at least `minTextLen` characters AND at most
    * `maxLinkDensityPct`% of those characters sit inside anchors —
    * the jusText-style decision that drops navigation bars, footers,
    * and related-links boxes (nearly all anchor text) while keeping
    * paragraphs (body text with the occasional inline link). The
    * density compare is integer arithmetic (`anchorLen * 100 <=
    * textLen * pct`) — no float rounds to disagree over.
    *
    * Order-preserving end to end (`split` → `filter` → `transform` →
    * `concat_ws` all keep element order), so `main_text` is the page's
    * content blocks in reading order, newline-joined — ready for
    * [[TextFunctions.c4KeptLines]] / [[TextFunctions.gopherStats]].
    */
  def mainContent(
      html: Column,
      minTextLen: Int = 25,
      maxLinkDensityPct: Int = 30): Column = {
    require(minTextLen >= 1, s"minTextLen must be >= 1, got $minTextLen")
    require(
      maxLinkDensityPct >= 0 && maxLinkDensityPct <= 100,
      s"maxLinkDensityPct must be in [0, 100], got $maxLinkDensityPct")
    val blocks = split(stripNonContent(html), BlockTagPattern)
    // the keep decision reads the RAW block twice (text + anchor text);
    // survivors re-clean once more for the output join — recomputation
    // inside one projection beats carrying a struct array through the
    // filter, and the oracle replays the same double evaluation
    val kept = filter(
      blocks,
      b =>
        (length(visibleText(b)) >= minTextLen) &&
          (length(anchorText(b)) * 100 <=
            length(visibleText(b)) * maxLinkDensityPct))
    struct(
      size(blocks).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"),
      concat_ws("\n", transform(kept, b => visibleText(b))).as("main_text"))
  }
}
