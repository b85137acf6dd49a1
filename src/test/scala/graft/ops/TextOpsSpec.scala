package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-grams in order; short docs yield empty array, never garbage") {
    val df = Seq("a b c d", "a b", "").toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got === List(List("a b c", "b c d"), Nil, Nil))
  }

  test("fingerprint is whitespace/case-canonical") {
    val df = Seq("Hello  World", "hello world ", "different").toDF("t")
      .select(TextOps.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) === fps(1)); assert(fps(0) !== fps(2))
  }

  test("langId: marker votes with deterministic precedence") {
    val df = Seq(
      "the cat and the dog", // en
      "der hund und die katze ist", // de
      "le chat et la chatte", // fr
      "el gato que los perros", // es
      "xyzzy qwerty" // unknown
    ).toDF("text").select(TextOps.langId(TextOps.tokens(col("text"))).as("l"))
    assert(df.collect().map(_.getString(0)).toList ===
      List("en", "de", "fr", "es", "unknown"))
  }

  test("quality buckets: too_short, high_stopword, repetitive, ok") {
    val repeats = ("word " * 40).trim // 40 tokens, 1 distinct → repetitive
    val stopy = ("the and of to a " * 8).trim // all stopwords
    val okDoc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      ("tiny doc", 8L), (stopy, 200L), (repeats, 200L), (okDoc, 300L)
    ).toDF("text", "n_chars")
      .select(TextOps.qualityBucket(TextOps.tokens(col("text")), col("n_chars")).as("q"))
    assert(df.collect().map(_.getString(0)).toList ===
      List("too_short", "high_stopword", "repetitive", "ok"))
  }

  test("rolling fingerprint is order-sensitive; canonical md5 fingerprint is not") {
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("t")
      .select(
        TextOps.rollingFingerprint(TextOps.tokenCodes(TextOps.tokens(col("t")))).as("rh"),
        TextOps.fingerprint(concat_ws(" ",
          array_sort(TextOps.tokens(col("t"))))).as("bagfp"))
    val rows = df.collect()
    assert(rows(0).getLong(0) !== rows(1).getLong(0)) // order matters
    assert(rows(0).getString(1) === rows(1).getString(1)) // bag-of-words equal
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < TextOps.RollM))
  }

  test("shingle law: n tokens yield max(0, n-k+1) shingles, each of k tokens (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val doc = Gen.listOf(word).map(_.mkString(" "))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(doc) { text =>
        val sh = Seq(text).toDF("t")
          .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("sh"))
          .collect()(0).getSeq[String](0)
        val nToks = if (text.isEmpty) 1 else text.split(" ", -1).length
        sh.length == math.max(0, nToks - 2) &&
          sh.forall(_.split(" ", -1).length == 3)
      })
    assert(res.passed, res.status.toString)
  }

  test("rolling fingerprint stays in [0, M) for any input (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val doc = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
      .map(_.mkString(" "))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAll(doc) { text =>
        val fp = Seq(text).toDF("t")
          .select(TextOps.rollingFingerprint(
            TextOps.tokenCodes(TextOps.tokens(col("t")))).as("fp"))
          .collect()(0).getLong(0)
        fp >= 0 && fp < TextOps.RollM
      })
    assert(res.passed, res.status.toString)
  }

  test("regexTokens keeps punctuation as tokens (BPE-ish pre-tokenizer)") {
    val df = Seq("hi, world!").toDF("t")
      .select(TextOps.regexTokens(col("t")).as("toks"))
    assert(df.collect()(0).getSeq[String](0).toList ===
      List("hi", ",", "world", "!"))
  }
}
