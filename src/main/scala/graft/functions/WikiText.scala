package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** F14 — HTML → MediaWiki rich-text conversion
  * (lib/Modware/Role/Command/WithMediaWikiFormatter.pm, used by
  * chado2genesummary.pm:114). The one place a real UDF is warranted
  * (SURVEY.md §7): branchy string rewriting with nesting, not
  * expressible as codegen'd column ops. Keep it off the hot path — gene
  * summaries are dimension-sized.
  */
object WikiText {

  private val rules: Seq[(String, String)] = Seq(
    "(?is)<b>(.*?)</b>" -> "'''$1'''",
    "(?is)<strong>(.*?)</strong>" -> "'''$1'''",
    "(?is)<i>(.*?)</i>" -> "''$1''",
    "(?is)<em>(.*?)</em>" -> "''$1''",
    "(?is)<a\\s+href=\"([^\"]*)\"[^>]*>(.*?)</a>" -> "[$1 $2]",
    "(?is)<br\\s*/?>" -> "\n",
    "(?is)</?p>" -> "\n",
    "(?is)<sup>(.*?)</sup>" -> "<sup>$1</sup>", // wiki keeps sup/sub
    "(?is)<[^>]+>" -> "") // strip anything else

  def htmlToWiki(html: String): String =
    if (html == null) null
    else rules.foldLeft(html) { case (s, (re, rep)) => s.replaceAll(re, rep) }
      .replaceAll("\n{3,}", "\n\n").trim

  val htmlToWikiUdf = udf(htmlToWiki _)

  def html_to_wiki(c: Column): Column = htmlToWikiUdf(c)
}
