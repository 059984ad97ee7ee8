package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Porter2

/** Porter2 goldens — each pair hand-derived from the published
  * Snowball english algorithm (step-by-step), covering every step and
  * the exception lists. */
class StemmerSpec extends AnyFunSuite {

  val goldens: Seq[(String, String)] = Seq(
    // exceptional forms
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "atlas" -> "atlas", "bias" -> "bias",
    // post-1a invariants
    "inning" -> "inning", "outing" -> "outing", "herring" -> "herring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // step 1a
    "caresses" -> "caress", "ties" -> "tie", "cries" -> "cri",
    "gas" -> "gas", "gaps" -> "gap", "kiwis" -> "kiwi",
    // step 1b
    "agreed" -> "agre", "feed" -> "feed", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "cry" -> "cri", "by" -> "by", "say" -> "say",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "digitizer" -> "digit", "operator" -> "oper",
    "feudalism" -> "feudal",
    // step 3 (+5)
    "hopefulness" -> "hope", "goodness" -> "good", "electrical" -> "electr",
    // step 4
    "radical" -> "radic", "adjustment" -> "adjust",
    "defensible" -> "defens", "revision" -> "revis", "effective" -> "effect",
    // step 5
    "rate" -> "rate", "cease" -> "ceas",
    // short words untouched
    "a" -> "a", "is" -> "is", "be" -> "be")

  test("Porter2 golden vectors") {
    val failures = goldens.collect {
      case (in, want) if Porter2.stem(in) != want =>
        s"$in: got ${Porter2.stem(in)}, want $want"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("analyzer pipeline: lowercase + fold + stem over a phrase") {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    graft.functions.TextFunctions.register(spark)
    val out = Seq("Rational Alimenté CONDITIONAL  happy")
      .toDF("text")
      .select(graft.functions.TextFunctions.analyzeBlankEnglish(col("text")))
      .collect()(0).getSeq[String](0)
    // rational: step-4 al in R2 → ration; alimenté folds to alimente,
    // final e in R2 → aliment
    assert(out === Seq("ration", "aliment", "condit", "happi"))
  }

  test("SQL registration") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    graft.functions.TextFunctions.register(spark)
    val got = spark.sql("SELECT snowball_stem(ascii_fold('relational'))")
      .collect()(0).getString(0)
    assert(got === "relat")
  }
}
