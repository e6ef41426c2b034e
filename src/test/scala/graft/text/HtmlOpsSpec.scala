package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minWords: Int = 3,
                      perMille: Int = 500): String =
    Seq(html).toDF("h")
      .select(HtmlOps.extractText(col("h"), minWords, perMille).as("t"))
      .as[String].head()

  test("extractText: keeps content, drops nav/link-soup and short blocks") {
    val html =
      """<html><head><title>T</title><style>p {color: red}</style>
        |<script type="text/javascript">var x = 1 < 2;</script></head>
        |<body><div class="nav"><a href="/">Home</a> <a href="/a">About</a>
        |<a href="/l">Login</a></div>
        |<h1>two words</h1>
        |<p>the quick brown fox jumps over the lazy dog</p>
        |<div>See: <a href="/x">alpha</a> <a href="/y">beta</a>
        |<a href="/z">gamma</a></div>
        |<footer>&copy; 2026 Example &amp; Sons &lt;legal&gt;</footer>
        |</body></html>""".stripMargin
    val got = extract(html)
    // nav: 3 anchors / 3 words -> dropped; h1: 2 words -> dropped;
    // link-soup div: 3 anchors / 4 words -> dropped; p + footer kept
    assert(got ===
      "the quick brown fox jumps over the lazy dog\n" +
        "&copy; 2026 Example & Sons <legal>")
  }

  test("script/style/comment bodies never reach text; entities decode " +
      "one level (&amp;lt; stays literal &lt;)") {
    val html = "<p>a b c <!-- hidden words --> d</p>" +
      "<p>x &amp;lt; y literal</p><script>secret()</script>"
    assert(extract(html) === "a b c d\nx &lt; y literal")
    assert(extract("<style>.x{}</style><p>one two three</p>")
      === "one two three")
  }

  test("br splits blocks so each line gates independently") {
    // 'tiny' alone fails minWords; the long line passes
    assert(extract("<p>tiny<br>this line has five words</p>")
      === "this line has five words")
  }

  test("stripHtml keeps everything visible, collapsed") {
    val got = Seq("<div><a href='/'>Home</a>  <b>bold</b>\n\ttext</div>")
      .toDF("h").select(HtmlOps.stripHtml(col("h")).as("t"))
      .as[String].head()
    assert(got === "Home bold text")
  }

  test("blockStats exposes the audit triple per block") {
    val stats = Seq("<p>one two</p><div><a href='/'>x</a> y z w</div>")
      .toDF("h").select(explode(HtmlOps.blockStats(col("h"))).as("b"))
      .select("b.text", "b.n_words", "b.n_anchors")
      .as[(String, Int, Int)].collect()
      .filter(_._2 > 0)
    assert(stats === Array(("one two", 2, 0), ("x y z w", 4, 1)))
  }

  test("extractText matches a driver-side Java-regex model on random " +
      "messy pages (independent of Catalyst's regexp/HOF evaluation)") {
    def decode(s: String): String =
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(s) { case (acc, (f, t)) => acc.replace(f, t) }
    def model(html: String, minWords: Int, perMille: Int): String = {
      val vis = html
        .replaceAll("(?is)<script[^>]*>.*?</script>", " ")
        .replaceAll("(?is)<style[^>]*>.*?</style>", " ")
        .replaceAll("(?s)<!--.*?-->", " ")
      vis.split(HtmlOps.BlockTagPattern, -1).flatMap { b =>
        val anchors = b.split(HtmlOps.AnchorPattern, -1).length - 1
        val words = decode(b.replaceAll("<[^>]*>", " "))
          .split(HtmlOps.WsRun).filter(_.nonEmpty)
        if (words.length >= minWords &&
            anchors * 1000 <= perMille * words.length)
          Some(words.mkString(" "))
        else None
      }.mkString("\n")
    }
    val rnd = new scala.util.Random(1337L)
    val words = Seq("alpha", "beta", "gamma", "delta", "text", "words",
      "&amp;", "&lt;x&gt;", "&amp;lt;", "a&nbsp;b", "it&#39;s")
    val blockTags = Seq("p", "div", "li", "h2", "BR", "section", "TD")
    def phrase(n: Int): String =
      (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    def randBlock(): String = rnd.nextInt(6) match {
      case 0 => s"<p>${phrase(1 + rnd.nextInt(8))}</p>"
      case 1 =>
        val t = blockTags(rnd.nextInt(blockTags.size))
        s"<$t class='x'>${phrase(1 + rnd.nextInt(6))}</$t>"
      case 2 => // link soup with a variable anchor/word balance
        val links = (0 to rnd.nextInt(4)).map(i =>
          s"<a href='/$i'>${phrase(1 + rnd.nextInt(2))}</a>").mkString(" ")
        s"<div>${phrase(rnd.nextInt(3))} $links</div>"
      case 3 => s"<script>var x = ${rnd.nextInt(99)} < 7;</script>"
      case 4 => s"<!-- ${phrase(2)} --><style>.q{}</style>"
      case 5 => s"${phrase(1 + rnd.nextInt(4))}<br>${phrase(rnd.nextInt(3))}"
    }
    val pages = (1L to 120L).map(i =>
      (i, (0 to rnd.nextInt(7)).map(_ => randBlock()).mkString(" ")))
    val got = pages.toDF("id", "h")
      .select(col("id"), HtmlOps.extractText(col("h"), 2, 600).as("t"))
      .as[(Long, String)].collect().toMap
    pages.foreach { case (id, html) =>
      assert(got(id) === model(html, 2, 600), s"page $id: $html")
    }
  }

  test("degenerate inputs: empty page, page with no block tags, null") {
    assert(extract("") === "")
    assert(extract("plain words with no tags at all")
      === "plain words with no tags at all")
    val n = Seq((1L, null: String)).toDF("id", "h")
      .select(HtmlOps.extractText(col("h")).as("t"))
      .as[Option[String]].head()
    assert(n.isEmpty) // null in, null out — no crash
  }
}
