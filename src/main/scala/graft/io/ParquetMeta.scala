package graft.io

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata probes: answers that live entirely in the
  * file footers, without launching a Spark job. A count(*) scan — even
  * with an empty projection — still schedules one task per split; for
  * plan-construction inputs (e.g. the IVF centroid stride, which needs
  * the corpus row count before the query can be BUILT) the footer read
  * is the right tool: O(#files) sequential metadata fetches, zero
  * cluster work, exact.
  */
object ParquetMeta {

  /** Exact row count of a parquet file or directory from footer metadata
    * only. Hidden files (`_…`, `.…`) are skipped, matching Spark's own
    * file enumeration.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def visible(p: Path): Boolean = {
      val n = p.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def files(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(s => visible(s.getPath)).flatMap(s => files(s.getPath))
      else if (visible(p)) Seq(p)
      else Nil
    }
    files(root).map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.toArray.map {
        case b: org.apache.parquet.hadoop.metadata.BlockMetaData => b.getRowCount
      }.sum
      finally r.close()
    }.sum
  }
}
