package graft

import graft.sources.TsvTables
import org.apache.spark.sql.types._
import java.nio.file.Files

class TsvSpec extends SparkSpecBase {

  test("positional TSV with '#' comments reads like the reference's .cat files") {
    val dir = Files.createTempDirectory("graft_tsv")
    val f = dir.resolve("master.cat")
    Files.writeString(f,
      "# master catalog\n# id x y ra dec\n" +
      "1\t10.5\t20.5\t150.1\t-30.2\n" +
      "2\t11.5\t21.5\t150.2\t-30.3\n")
    val schema = StructType(Seq(
      StructField("master_id", IntegerType), StructField("xpix", DoubleType),
      StructField("ypix", DoubleType), StructField("ra", DoubleType),
      StructField("dec", DoubleType)))
    val df = TsvTables.readPositional(spark, f.toString, schema)
    val rows = df.orderBy("master_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1 && rows(0).getDouble(1) == 10.5)
    assert(rows(1).getDouble(4) == -30.3)
  }

  test("headered TSV writes and reads back losslessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tsv2").toString + "/slopes"
    val df = Seq(("p1", 0.0012, 57), ("p2", -0.0034, 43))
      .toDF("pair", "slope", "numpoints")
    TsvTables.write(df, dir)
    val schema = StructType(Seq(
      StructField("pair", StringType), StructField("slope", DoubleType),
      StructField("numpoints", IntegerType)))
    val back = TsvTables.readNamed(spark, dir, schema).orderBy("pair").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "p1" && back(0).getDouble(1) == 0.0012)
    assert(back(1).getInt(2) == 43)
  }
}
