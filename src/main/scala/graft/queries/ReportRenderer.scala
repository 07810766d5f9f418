package graft.queries

import org.apache.spark.sql.DataFrame

/** SQL*Plus-style report rendering (SURVEY §2.1 sink row): page title,
  * BREAK-on-column group separation, and COMPUTE SUM subtotal lines
  * (ref LQY_query1.txt:16-37, LQY_query2.txt:36-54, LQY_query3.txt:40-60).
  *
  * Driver-side by design: a report is human-sized output (top-N per
  * group), so the engine reduces first and the renderer formats a few
  * hundred collected rows — never a data-plane operation.
  */
object ReportRenderer {

  /** Render `df` with a page title, breaking on `breakCol` (value printed
    * only on change, like SQL*Plus BREAK) and emitting a subtotal line for
    * each `computeCols` column at each break (like COMPUTE SUM ... ON).
    *
    * `maxRows` (default 1000) BOUNDS the driver-side collect: rows beyond
    * it are silently dropped from the rendering, exactly like SQL*Plus'
    * pagesize window — reduce in the engine first (top-N per group) and
    * treat the cap as a presentation limit, not a data-plane one. Raise
    * it consciously; it is the only collect in the report path. */
  def render(df: DataFrame, title: String, breakCol: String, computeCols: Seq[String], maxRows: Int = 1000): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(maxRows).collect()
    val breakIdx   = cols.indexOf(breakCol)
    val computeIdx = computeCols.map(cols.indexOf)
    require(breakIdx >= 0, s"break column $breakCol not in ${cols.mkString(",")}")
    require(computeIdx.forall(_ >= 0), s"compute columns $computeCols not all in ${cols.mkString(",")}")

    def fmt(v: Any): String = v match {
      case null      => ""
      case d: Double => f"$d%.2f"
      case x         => x.toString
    }
    val table  = rows.map(r => cols.indices.map(i => fmt(r.get(i))))
    val widths = cols.indices.map(i => (cols(i).length +: table.map(_(i).length)).max)
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("| ", " | ", " |")

    val sb = new StringBuilder
    sb.append(title).append('\n')
    sb.append("=" * title.length).append('\n')
    sb.append(line(cols)).append('\n')
    sb.append(line(widths.map("-" * _))).append('\n')

    var groupVal: Option[String] = None
    val sums = Array.fill(computeIdx.size)(0.0)
    def subtotal(): Unit = groupVal.foreach { g =>
      val cells = cols.indices.map { i =>
        if (i == breakIdx) s"sum($g)"
        else computeIdx.indexOf(i) match {
          case -1 => ""
          case k  => f"${sums(k)}%.2f"
        }
      }
      sb.append(line(cells)).append('\n')
      java.util.Arrays.fill(sums, 0.0)
    }

    table.zip(rows).foreach { case (cells, row) =>
      val g          = cells(breakIdx)
      val groupStart = !groupVal.contains(g)
      if (groupStart) {
        subtotal()
        groupVal = Some(g)
      }
      // BREAK semantics: the group value prints only on its first row
      val display = cells.indices.map(i => if (i == breakIdx && !groupStart) "" else cells(i))
      computeIdx.zipWithIndex.foreach { case (ci, k) =>
        row.get(ci) match {
          case d: java.lang.Double => sums(k) += d
          case l: java.lang.Long   => sums(k) += l.toDouble
          case _                   =>
        }
      }
      sb.append(line(display)).append('\n')
    }
    subtotal()
    sb.toString
  }
}
