package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("text").select(c).head()

  test("tokens / shingles / counts") {
    assert(one(TextFunctions.tokenCount(col("text")), "The quick  brown fox").getInt(0) == 4)
    val sh = one(TextFunctions.shingles(col("text"), 3), "a b c d").getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    assert(one(TextFunctions.shingles(col("text"), 3), "a b").getSeq[String](0).isEmpty)
    // BPE-ish: letter runs, single digits, single punct
    assert(one(TextFunctions.bpeishTokenCount(col("text")), "ab1 cd!").getInt(0) == 4)
  }

  test("language id picks the language with most marker hits") {
    assert(one(TextFunctions.langId(col("text")),
      "the cat sat on the mat and it is warm").getString(0) == "en")
    assert(one(TextFunctions.langId(col("text")),
      "el perro y la casa de los amigos es grande").getString(0) == "es")
    assert(one(TextFunctions.langId(col("text")),
      "der hund und die katze das ist nicht gut").getString(0) == "de")
    assert(one(TextFunctions.langId(col("text")),
      "zzz qqq xxx").getString(0) == "und")
  }

  test("fingerprint is the Karp-Rabin polynomial mod 1e9+7") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
    for (s <- Seq("abc", "hello world", "x")) {
      assert(one(TextFunctions.fingerprint(col("text")), s).getLong(0) == ref(s), s)
    }
  }

  test("quality score stays in [0,1] and ranks clean text above noise") {
    val clean = "the quick brown fox jumps over the lazy dog and runs to the hills " * 3
    val noisy = "@@ ## !! $$ %% ^^ && ** (( ))"
    val qc = one(TextFunctions.qualityScore(col("text")), clean).getDouble(0)
    val qn = one(TextFunctions.qualityScore(col("text")), noisy).getDouble(0)
    assert(qc >= 0.0 && qc <= 1.0 && qn >= 0.0 && qn <= 1.0)
    assert(qc > qn)
  }

  test("BPE training applies GREEDY merges: runs pair up, fresh merges chain") {
    // hand-verified reference on an adversarial corpus: "aaaa" under
    // rule (a,a) must segment [aa, aa] (the fold's fresh "aa" must NOT
    // re-match "a"), "abab" merges both non-overlapping sites, and
    // "banana" yields [b, an, an, a] once (a,n) wins a round. Rule
    // counts are word-frequency weighted: (a,a) = 3 pairs x 2 copies
    // of "aaaa" + 1 pair in "aa" = 7.
    val docs = Seq("aaaa abab banana", "aaaa abab banana", "aa ab").toDF("text")
    val rules = CorpusQueries.bpeTrain(docs, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq == Seq((1L, "a", "a", 7L), (2L, "a", "b", 5L), (3L, "a", "n", 4L)),
      rules.mkString(", "))
  }
}
