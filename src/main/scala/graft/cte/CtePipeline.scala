package graft.cte

import graft.sources.{MergeWriter, TsvTables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline — the reference's `run_uvis_external_cte.py`
  * lifecycle (SURVEY.md §3.1) as three composable stages over a parquet
  * warehouse:
  *
  *   1. ingest: read master catalogs (.cat positional TSV) and long-format
  *      photometry tables, upsert into the warehouse by natural key
  *      (idempotent — re-running a visit is a no-op, README.md:519-521);
  *   2. analyze: the pair→match→clip→regress slope pipeline, upserted
  *      into `results` on (imagename_1, imagename_2, aperture, bin);
  *   3. publish: slope table + per-target polyfit coefficients as
  *      headered TSV artifacts (the reference's slopes/coeffs files).
  *
  * Warehouse layout: `<root>/<table>` parquet dirs, hive-partitioned by
  * `targname` (the reference's 3× per-target table fan-out becomes
  * partition pruning — every `targname === …` filter prunes to one
  * directory). Natural keys exactly as the reference:
  * master (targname, master_id), fileinfo (targname, imagename),
  * phot (targname, imagename, find_id, aperture),
  * results (targname, imagename_1, imagename_2, aperture, bin_lo, bin_hi).
  */
class CtePipeline(spark: SparkSession, warehouse: String) {

  private def path(t: String) = s"$warehouse/$t"

  def table(t: String): DataFrame = spark.read.parquet(path(t))

  // ---- stage 1: ingest

  /** Ingest a master catalog from a positional .cat TSV
    * (database_reset.py:322-328: col1=id col2=xpix col3=ypix col4=ra
    * col5=dec). */
  def ingestMasterCat(catPath: String, targname: String): Unit = {
    val raw = TsvTables.readPositional(spark, catPath,
      org.apache.spark.sql.types.StructType(
        SchemaRegistry.master.fields.filter(_.name != "targname")))
      .withColumn("targname", lit(targname))
    MergeWriter.upsertParquet(spark, path("master"), raw,
      Seq("targname", "master_id"), partitionCols = Seq("targname"))
  }

  /** Ingest fileinfo rows (already header-parsed upstream; S2). */
  def ingestFileinfo(rows: DataFrame): Unit =
    MergeWriter.upsertParquet(spark, path("fileinfo"), rows,
      Seq("targname", "imagename"), partitionCols = Seq("targname"))

  /** Ingest long-format photometry (one row per source × aperture; the
    * reference's mag-file pivot state machine is unnecessary in long
    * form — A10 runs only in the wide compatibility view). */
  def ingestPhot(rows: DataFrame): Unit =
    MergeWriter.upsertParquet(spark, path("phot"), rows,
      Seq("targname", "imagename", "find_id", "aperture"),
      partitionCols = Seq("targname"))

  /** Ingest one image's IRAF-photometry pair: a DAOphot `.mag` file (long
    * star×aperture rows with A11's totbkgrd = AREA×MSKY) plus its `.coo`
    * catalog match file. The nth coo row belongs to the star with
    * find_id n — the reference aligns them by position, not key
    * (database_update.py:481-485). */
  def ingestIrafPhot(magPath: String, cooPath: String, targname: String,
                     imagename: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mag = TsvTables.readDaophotMag(spark, magPath)
    val cooSchema = StructType(Seq(
      StructField("master_id", IntegerType),
      StructField("extr_ra", DoubleType),
      StructField("extr_dec", DoubleType)))
    // coo files are dimension-sized (one per image); zipWithIndex on a
    // single partition keeps the file's row order authoritative.
    val cooIdx = spark.createDataFrame(
      TsvTables.readNamed(spark, cooPath, cooSchema)
        .coalesce(1).rdd.zipWithIndex.map { case (r, i) =>
          Row(r.getInt(0), r.getDouble(1), r.getDouble(2), i + 1L) },
      StructType(cooSchema.fields :+ StructField("rn", LongType)))
    val rows = mag.join(cooIdx, mag("find_id") === cooIdx("rn"))
      .select(col("find_id"), lit(imagename).as("imagename"),
        current_date().as("ingest_date"), col("master_id"),
        col("xpix"), col("ypix"),
        col("extr_ra").as("ra"), col("extr_dec").as("dec"),
        col("aperture"), col("flux"), col("mnbkgrd"), col("totbkgrd"),
        lit(targname).as("targname"))
    ingestPhot(rows)
  }

  // ---- stage 2: analytics

  /** Compute CTE slopes for one target and upsert into `results`. */
  def computeSlopes(targname: String,
                    preds: Map[String, Any] = Map.empty): DataFrame = {
    val slopes = CteAnalytics.fluxRatioSlopes(
        table("phot"), table("fileinfo"), targname, preds = preds)
      .withColumn("slopefile", lit(s"${targname}_slopes.txt"))
      .withColumn("slopefile_path", lit(s"$warehouse/artifacts"))
    MergeWriter.upsertParquet(spark, path("results"), slopes,
      Seq("targname", "imagename_1", "imagename_2", "aperture",
          "bin_lo", "bin_hi"), partitionCols = Seq("targname"))
    slopes
  }

  /** Slope rows joined to their combined epoch and bin-flux midpoint —
    * the polyfit input (shared by the current fit and the history). */
  private def slopeRows(targname: String): DataFrame = {
    val cohorts = CteAnalytics.epochCohorts(table("fileinfo"), targname)
    val pairEpoch = table("fileinfo")
      .filter(col("targname") === targname && col("chip") === 1)
      .select(col("imagename").as("imagename_1"), col("dateobs"))
      .join(broadcast(cohorts), "dateobs")
    table("results")
      .filter(col("targname") === targname && !isnan(col("slope")))
      .join(broadcast(pairEpoch), "imagename_1")
      .withColumn("binflux",
        (col("bin_lo").cast("double") + col("bin_hi").cast("double")) / 2.0)
      .select("targname", "binflux", "epoch", "slope")
  }

  /** Per-target polyfit over epoch cohorts: joins results back to the
    * pair's epoch (via chip-1 dateobs → combined epoch) and bin flux
    * midpoint, then fits the 9-coefficient surface. */
  def computeCoefficients(targname: String): DataFrame =
    CteAnalytics.polyfitByTarget(slopeRows(targname))

  /** Epoch-keyed coefficient history (the reference's sorted
    * *_mjd<epoch>_coeffs.txt set): one cumulative fit per combined
    * epoch; the max-epoch row matches computeCoefficients. */
  def coefficientHistory(targname: String): DataFrame =
    CteAnalytics.polyfitHistory(slopeRows(targname))

  // ---- stage 3: publish

  /** Write the reference's derived text artifacts (S6): slopes, polyfit
    * coefficients, the per-star sigma-clipped flux ratios
    * (*fluxratios.txt), the cteVStime table (the monitor's primary
    * product), and the model fit values on the flux grid (*fitvals.txt)
    * evaluated at the latest combined epoch. */
  def publish(targname: String, outDir: String): Unit = {
    TsvTables.write(
      table("results").filter(col("targname") === targname)
        .orderBy("imagename_1", "imagename_2", "aperture", "bin_lo"),
      s"$outDir/${targname}_slopes")
    val coeffs = computeCoefficients(targname)
    TsvTables.write(coeffs, s"$outDir/${targname}_coeffs")
    TsvTables.write(
      coefficientHistory(targname).orderBy("targname", "as_of_epoch"),
      s"$outDir/${targname}_coeffs_history")
    TsvTables.write(
      CteAnalytics.clippedRatios(table("phot"), table("fileinfo"), targname)
        .orderBy("imagename_1", "imagename_2", "aperture", "bin_lo", "master_id"),
      s"$outDir/${targname}_fluxratios")
    TsvTables.write(
      CteAnalytics.cteVsTime(
          table("results").filter(col("targname") === targname),
          table("fileinfo"))
        .orderBy("aperture", "mjd", "fluxbin"),
      s"$outDir/${targname}_cteVStime")
    TsvTables.write(
      CteAnalytics.cteVsFlashlvl(
          table("results").filter(col("targname") === targname),
          table("fileinfo"), targname)
        .orderBy("aperture", "fluxbin", "epoch", "flashlvl", "imagename_1"),
      s"$outDir/${targname}_cteVSflashlvl")
    // Latest combined epoch — "Users should be using coefficients from
    // the latest epoch" (uvis_external_cte_plots.py:612-613); the epoch
    // list is dimension-sized.
    val latestEpoch = CteAnalytics
      .epochCohorts(table("fileinfo"), targname)
      .agg(max(col("epoch"))).collect()(0).getDouble(0)
    TsvTables.write(
      CteAnalytics.fitvalsTable(coeffs, latestEpoch).orderBy("logflux"),
      s"$outDir/${targname}_fitvals")
  }

  /** Render the reference's flux-ratio-vs-ypos slope figures (S7): one
    * PNG per (pair, aperture) with a scatter per flux bin and its fitted
    * line, named `<stem>_slopes.png` like the original
    * (uvis_external_cte_plots.py:247-289). The collected frame is PLOT
    * data — the clipped ratio points and per-bin slopes the reference
    * itself hands matplotlib — dimension-sized (stars per pair), never a
    * raw table. The fit line re-derives the OLS intercept as
    * ȳ − slope·x̄ over the same clipped points the slope came from. */
  def publishPlots(targname: String, outDir: String): Unit = {
    val pts = CteAnalytics
      .clippedRatios(table("phot"), table("fileinfo"), targname)
      .select("imagename_1", "imagename_2", "aperture", "bin_lo", "bin_hi",
        "ypos", "fluxratio_sigclpd")
      .collect()
    val slopeOf = table("results").filter(col("targname") === targname)
      .select("imagename_1", "imagename_2", "aperture", "bin_lo", "slope")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Number]("aperture").intValue, r.getAs[Number]("bin_lo").intValue)
        -> r.getAs[Number]("slope").doubleValue)
      .toMap
    pts.groupBy(r => (r.getString(0), r.getString(1),
        r.getAs[Number]("aperture").intValue)).foreach {
      case ((i1, i2, ap), rows) =>
        val series = rows
          .groupBy(r => (r.getAs[Number]("bin_lo").intValue,
            r.getAs[Number]("bin_hi").intValue))
          .toSeq.sortBy(_._1)
          .map { case ((lo, hi), rs) =>
            val xs = rs.map(_.getAs[Number]("ypos").doubleValue).toArray
            val ys = rs.map(_.getAs[Number]("fluxratio_sigclpd").doubleValue)
              .toArray
            val fit = slopeOf.get((i1, i2, ap, lo)).map { m =>
              (ys.sum / ys.length - m * xs.sum / xs.length, m)
            }
            PlotSink.Series(s"$lo-$hi e-", xs, ys, fit)
          }
        PlotSink.scatterPng(
          new java.io.File(outDir, Artifacts.slopePlotName(i1, i2, ap)),
          targname, "Y-position_chip2 [pxl]", "Flux_chip1 / Flux_chip2",
          series)
    }
  }

  /** The monitor's primary figure (uvis_external_cte_plots.py:312-421):
    * CTE slope vs MJD, one scatter series per tracked flux bin, per
    * aperture — rendered from the same cteVStime product the text sink
    * publishes. File per aperture: `<targname>_cteVStime_r<ap>.png`. */
  def publishCteVsTimePlot(targname: String, outDir: String): Unit = {
    val rows = CteAnalytics.cteVsTime(
        table("results").filter(col("targname") === targname),
        table("fileinfo"))
      .select("aperture", "fluxbin", "mjd", "slope")
      .collect()
    rows.groupBy(_.getAs[Number]("aperture").intValue).foreach {
      case (ap, rs) =>
        val series = rs.groupBy(_.getString(1)).toSeq.sortBy(_._1)
          .map { case (bin, b) =>
            PlotSink.Series(s"$bin e-",
              b.map(_.getAs[Number]("mjd").doubleValue),
              b.map(_.getAs[Number]("slope").doubleValue))
          }
        PlotSink.scatterPng(
          new java.io.File(outDir, s"${targname}_cteVStime_r$ap.png"),
          targname, "MJD Date", "CTE loss [flux / 2048 pxl]", series)
    }
  }

  /** Full run for one target: analytics + publish (ingest is per-source
    * upstream, as in the reference's per-proposal loop). */
  def run(targname: String, outDir: String): Unit = {
    computeSlopes(targname)
    publish(targname, outDir)
    publishPlots(targname, outDir)
    publishCteVsTimePlot(targname, outDir)
  }
}
