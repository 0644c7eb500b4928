package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class HtmlTextSuite extends TestBase {
  import spark.implicits._

  private def run(html: String): String =
    new HtmlTextExtractor().setInputCol("html").setOutputCol("out")
      .transform(Seq(html).toDF("html")).select("out").as[String].head()

  test("full page: head dropped, blocks become lines, entities decode") {
    val html =
      """<html><head><title>Ignored</title>
        |<script>if (1 < 2) { alert("x"); }</script>
        |<style>p { color: red }</style></head>
        |<body><h1>Heading</h1><!-- comment -->
        |<p>First &amp; second &lt;para&gt;.</p>
        |<div>A&nbsp;B</div>
        |<ul><li>one</li><li>two</li></ul>
        |</body></html>""".stripMargin
    val out = run(html)
    assert(out ==
      "Heading\nFirst & second <para>.\nA B\none\ntwo",
      s"got:\n$out")
  }

  test("script content with embedded angle brackets never leaks") {
    val out = run("<p>keep</p><script>for(i=0;i<10;i++){d.write('<b>x</b>')}</script><p>tail</p>")
    assert(out == "keep\ntail")
  }

  test("inline tags strip without line breaks; attributes vanish") {
    assert(run("""<p>a <b>bold</b> and <a href="http://x/">link</a> end</p>""") ==
      "a bold and link end")
  }

  test("numeric quote/apostrophe entities and apos decode") {
    assert(run("<p>it&#39;s a &quot;q&quot; &#34;r&#34; &apos;s&apos;</p>") ==
      "it's a \"q\" \"r\" 's'")
  }

  test("whitespace: runs collapse, newline stacks collapse to one") {
    assert(run("<body><p>a</p>\n\n\n\n<p>b</p>   \t <p>c   d</p></body>") ==
      "a\nb\nc d")
  }

  test("numericEntities decodes general refs with WHATWG semantics") {
    def runN(html: String): String =
      new HtmlTextExtractor().setInputCol("html").setOutputCol("out")
        .setNumericEntities(true)
        .transform(Seq(html).toDF("html")).select("out").as[String].head()
    val cases = Seq(
      "a&#x2019;b" -> "a’b", // hex
      "a&#X2019;b" -> "a’b", // capital X
      "em&#8212;dash" -> "em—dash", // decimal
      "caf&#233;" -> "café",
      "it&#146;s" -> "it’s", // C1 -> cp1252 remap
      "c&#129;d" -> "c\u0081d", // cp1252-undefined C1 stays the control
      "s&#x1F600;!" -> "s😀!", // supplementary -> pair
      "x&#xD800;y" -> "x�y", // lone surrogate
      "x&#0;y" -> "x�y", // NUL
      "x&#x110000;y" -> "x�y", // out of range
      "x&#99999999999999999;y" -> "x�y", // over-long saturates
      "bad&#zz; t" -> "bad&#zz; t", // malformed: verbatim
      "no&#12 semi" -> "no&#12 semi", // missing ';': verbatim
      "tail&#" -> "tail&#", // dangling
      "esc&amp;#39;q" -> "esc&#39;q", // amp decodes last: no double decode
      "pre&#39;q" -> "pre'q") // chain literal still handled earlier
    cases.foreach { case (in, want) =>
      assert(runN(s"<p>$in</p>") == want, s"for <$in>")
    }
    // default stays the published regexp-replayable chain: refs survive
    assert(run("<p>a&#x2019;b</p>") == "a&#x2019;b")
  }

  test("native subtree kernel matches the spec regex semantics") {
    // the linear kernel replaces java-regex execution of steps 1-5;
    // RE2/.*? shortest-match semantics pinned on the tricky shapes
    val cases = Seq(
      "<!--a---->x" -> "x", // dash run before the closer
      "<!--a--->x" -> "x",
      // '-->' absent inside '<!--->': not a comment, but step 7 then
      // strips the whole '<...>' span as a tag — chain semantics
      "<!--->x" -> "x",
      "a<!-- b <!-- c -->d" -> "ad", // shortest close from FIRST opener
      "a<!-- open " -> "a<!-- open", // unclosed -> stays (then trimmed)
      "x<SCRIPT a=b>body</ScRiPt>y" -> "xy", // case-insensitive pair
      "x<script>a<b</script>y" -> "xy", // '<' inside the body
      "x<scripts>not a script</scripts>y" -> "xnot a scripty", // \b
      "x<script-a>b</script>y" -> "xy", // '-' passes \b like the regex
      "x<script no close" -> "x<script no close",
      "u<style>s</style><noscript>n</noscript><head>h</head>v" -> "uv")
    cases.foreach { case (in, want) =>
      assert(run(in) == want, s"for <$in>")
    }
  }

  test("adversarial pages (unclosed constructs, '>'-free text) stay linear-ish") {
    // the defect this guards: 300 KB of these shapes took 92-150 s
    // under java-regex execution; the kernel + bounded tag bodies do
    // them in well under a second — generous wall for CI noise
    val t0 = System.nanoTime()
    run("<!-- x " * 14000)
    run("<script> y " * 9000)
    run("a<b, c<d, " * 10000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"adversarial extraction took $secs s")
  }

  test("whole-stage codegen: the chain is expressions, not a UDF") {
    val df = Seq("x").toDF("html")
    val plan = new HtmlTextExtractor().setInputCol("html")
      .transform(df).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("null html yields null text") {
    val out = new HtmlTextExtractor().setInputCol("html").setOutputCol("out")
      .transform(Seq[(Long, String)]((1L, null)).toDF("id", "html"))
      .select("out").as[String].collect()
    assert(out.toSeq == Seq(null))
  }
}
