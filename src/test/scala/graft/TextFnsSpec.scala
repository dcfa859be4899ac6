package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Router text-op parity matrix (reference: tests/test_ollama_router.py
  * :21-57, catalogued in FIXTURES.md §A). */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def detect(texts: String*): Seq[String] =
    texts.toDF("t").select(TextFns.detectTrigger($"t")).as[String].collect().toSeq

  private def strip(texts: String*): Seq[String] =
    texts.toDF("t").select(TextFns.stripTriggers($"t")).as[String].collect().toSeq

  test("trigger matrix incl. case-insensitivity (:21-34)") {
    assert(detect("hello @ollama world") == Seq("@ollama"))
    assert(detect("@COPILOT help") == Seq("@copilot"))
    assert(detect("ping @Lucidia now") == Seq("@lucidia"))
    assert(detect("cc @blackboxprogramming") == Seq("@blackboxprogramming"))
    assert(detect("@OLLAMA") == Seq("@ollama"))
  }

  test("non-match: plain email (:30)") {
    assert(detect("email@example.com") == Seq(""))
    assert(detect("no trigger here") == Seq(""))
  }

  test("leftmost match wins") {
    assert(detect("@lucidia then @ollama") == Seq("@lucidia"))
  }

  test("no word boundary — embedded alias matches (ollama_router.py:41-44)") {
    assert(detect("x@copilotfoo") == Seq("@copilot"))
  }

  test("strip removes all aliases then trims (:48-57)") {
    assert(strip("@lucidia @ollama clean both") == Seq("clean both"))
    assert(strip("@ollama  hi") == Seq("hi"))
    assert(strip("untouched text") == Seq("untouched text"))
  }

  test("route decision columns (ollama_router.py:103-130)") {
    val (trig, routed, prompt) = TextFns.routeCols($"t")
    val rows = Seq("@ollama do it", "nothing").toDF("t")
      .select(trig.as("trigger"), routed.as("routed"), prompt.as("prompt"))
      .as[(String, Boolean, String)].collect().toSeq
    assert(rows == Seq(("@ollama", true, "do it"), ("", false, "nothing")))
  }

  test("langId picks the max-overlap stopword language") {
    val got = Seq(
      "the cat sat on the mat and it is fine",
      "der hund ist nicht auf das sofa und die katze",
      "el perro es un animal y la casa no es grande",
      "zzz qqq www").toDF("t")
      .select(TextFns.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("quality columns are sane on a known sentence") {
    val row = Seq("The quick fox, it jumps!").toDF("t")
      .select(TextFns.qualityCols($"t").map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Int]("n_tokens") == 5)
    assert(row.getAs[Double]("punct_ratio") > 0.0)
    assert(row.getAs[Double]("stopword_ratio") == 0.4) // "the", "it"
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello  World", "hello world", "different").toDF("t")
      .select(TextFns.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("chunkText: full coverage, exact overlap, tail handling") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    val chunks = Seq(Tuple1(text)).toDF("t")
      .select(TextFns.chunkText($"t", 10, 3).as("c"))
      .as[Seq[String]].head()
    // stride 7: ceil((36-3)/7) = 5 chunks
    assert(chunks.length == 5)
    assert(chunks.head == "abcdefghij")
    // overlap: each chunk's last 3 chars open the next chunk
    chunks.sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(3) == b.take(3))
    }
    // coverage: stitching stride-prefixes + last chunk rebuilds the doc
    assert(chunks.init.map(_.take(7)).mkString + chunks.last == text)

    val short = Seq(Tuple1("abc")).toDF("t")
      .select(TextFns.chunkText($"t", 10, 3).as("c")).as[Seq[String]].head()
    assert(short == Seq("abc"), "doc shorter than size is one chunk")
  }

  test("chunkTokens: lossless token partition at the budget") {
    val text = (1 to 37).map(i => s"w$i").mkString(" ")
    val chunks = Seq(Tuple1(text)).toDF("t")
      .select(TextFns.chunkTokens($"t", 8).as("c"))
      .as[Seq[String]].head()
    assert(chunks.length == 5) // ceil(37/8)
    chunks.foreach(c => assert(c.split(" ").length <= 8))
    // partition, not window: concatenating chunks rebuilds the doc
    assert(chunks.mkString(" ") == text)
    assert(chunks.last.split(" ").length == 5) // 37 - 4*8

    val one = Seq(Tuple1("only three tokens")).toDF("t")
      .select(TextFns.chunkTokens($"t", 8).as("c")).as[Seq[String]].head()
    assert(one == Seq("only three tokens"))

    // blank docs yield NO chunks, not one phantom empty chunk (ADVICE r6)
    val blanks = Seq("", "   ", "\t\n").map(Tuple1(_)).toDF("t")
      .select(TextFns.chunkTokens($"t", 8).as("c")).as[Seq[String]].collect()
    assert(blanks.forall(_.isEmpty), blanks.toSeq)
  }

  test("repetitionCols: known token/bigram repetition structure") {
    // "a b a b a": 5 tokens, 2 distinct → dup ratio 3/5; "a"×3 → top
    // token 3/5; bigrams [a b, b a, a b, b a] → top bigram 2/4.
    val df = Seq(
      (1L, "a b a b a"),
      (2L, "all distinct words here"),
      (3L, "solo")).toDF("doc_id", "t")
      .select($"doc_id" +: TextFns.repetitionCols($"t")
        .map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Double, Double, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(df(1L) == ((0.6, 0.6, Some(0.5))))
    assert(df(2L) == ((0.0, 0.25, Some(0.333333))))
    assert(df(3L) == ((0.0, 1.0, None)), "single token: bigram frac is null")
  }

  test("redactPii: emails, IPv4s, phones → typed placeholders; clean text untouched") {
    val got = Seq(
      "mail a.b+c@x-y.co.uk and 192.168.0.1 then call +44-201-5550199",
      "no pii at all, 1.2 ratio, v2.3.4 semver, a@b (not an email)")
      .toDF("t").select(TextFns.redactPii($"t").as("r")).as[String].collect()
    assert(got(0) == "mail <EMAIL> and <IP> then call <PHONE>")
    assert(got(1) == "no pii at all, 1.2 ratio, v2.3.4 semver, a@b (not an email)",
      "partial dotted numbers and tld-less at-signs must survive")
  }

  test("winnowing fingerprints: coverage property + short-doc emptiness") {
    // Two docs sharing a run of >= k+w-1 chars MUST share a fingerprint
    // (winnowing's guarantee); unrelated docs almost surely don't.
    val shared = "a common stretch of text that is plenty long"
    val df = Seq(
      (1L, s"PREFIX ONE $shared SUFFIX ONE"),
      (2L, s"other start $shared other end"),
      (3L, "zzqqxxjjkkvvwwyy totally unrelated gibberish 1234567"),
      (4L, "tiny")).toDF("doc_id", "t")
      .select($"doc_id", TextFns.winnowFingerprints($"t", 8, 4).as("fps"))
    val fps = df.as[(Long, Seq[String])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty,
      "docs sharing a long run must share a fingerprint")
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)
    assert(fps(4L).isEmpty, "below k+w-1 chars there is no window to select from")
    assert(fps(1L).forall(_.matches("[0-9a-f]{12}")), "12-hex-char md5 prefixes")
    assert(fps(1L) == fps(1L).sorted, "fingerprint set is emitted sorted")
  }
}
