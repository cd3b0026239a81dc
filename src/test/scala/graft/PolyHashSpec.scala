package graft

import graft.functions.TextPrims
import org.apache.spark.sql.functions._

/** Pins the native graft_polyhash codegen expression bit-identical to the
  * expr fragment it replaced (split-per-char + ascii fold), including the
  * multi-plane cases where the two could plausibly diverge: split('')
  * emits one element per CODE POINT and ascii() the full code point, so
  * the native UTF-8 fold must decode supplementary characters whole. */
class PolyHashSpec extends SparkSpecBase {
  import spark.implicits._

  private val exprFrag = TextPrims.polyhashExpr("t")

  private def bothWays(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("t")
    val rows = df.select(
      expr(exprFrag).as("old"), expr("graft_polyhash(t)").as("nu"),
      expr(TextPrims.posChecksumExpr("t")).as("oldPos"),
      expr("graft_poschecksum(t)").as("nuPos")).collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1),
        s"polyhash mismatch on ${in.take(40)}: ${r.getLong(0)} vs ${r.getLong(1)}")
      assert(r.getLong(2) == r.getLong(3),
        s"posChecksum mismatch on ${in.take(40)}: ${r.getLong(2)} vs ${r.getLong(3)}")
    }
  }

  test("edge inputs: empty, whitespace, controls, multi-plane unicode") {
    bothWays(Seq(
      "", "a", " ", "  leading and trailing  ", "tab\tand\nnewline",
      "héllo wörld", "日本語のテキスト", "a😀b🎉c", "😀", "",
      "mixed ascii 123 и кириллица و عربى", "ﬀ ligature ﬀ",
      "😀😁surrogates back to back"))
  }

  test("seeded random strings across planes match the expr fragment") {
    val rnd = new scala.util.Random(20260819L)
    def randCp(): Int = rnd.nextInt(4) match {
      case 0 => 32 + rnd.nextInt(95)              // ascii printable
      case 1 => 0xA0 + rnd.nextInt(0x600)         // latin-1 .. arabic
      case 2 => 0x3040 + rnd.nextInt(0x1000)      // CJK-ish BMP
      case _ => 0x1F300 + rnd.nextInt(0x200)      // supplementary plane
    }
    val inputs = (1 to 200).map { _ =>
      val n = rnd.nextInt(64)
      new String((1 to n).flatMap(_ => Character.toChars(randCp())).toArray)
    }
    bothWays(inputs)
  }

  test("null propagates as null") {
    val r = Seq[Option[String]](None, Some("x")).toDF("t")
      .select(expr("graft_polyhash(t)")).collect()
    assert(r(0).isNullAt(0) && r(1).getLong(0) == 120L)
  }

  test("works inside higher-order lambdas (hashEach path)") {
    val df = Seq(Seq("alpha", "beta_gamma", "", "日本")).toDF("arr")
    val out = df.select(
      expr(TextPrims.hashEach("arr", TextPrims.SparkD)).as("nu"),
      expr(s"transform(arr, t -> ${TextPrims.polyhashExpr("t")})").as("old"))
      .collect()(0)
    assert(out.getSeq[Long](0) == out.getSeq[Long](1))
  }
}
