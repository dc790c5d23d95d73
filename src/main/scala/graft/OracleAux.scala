package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Side-channel between a query run and its DuckDB oracle, for the two
  * ITERATIVE trainers (q111 logistic GD, q123 BPE merge induction) whose
  * learned artifact cannot be written down ahead of time: the query dumps
  * the trained model here during the Verify run, and the oracle builder
  * (evaluated AFTER all queries, when Verify serializes `oracleSql`) embeds
  * it as SQL literals — so the emitted oracle replays the corpus-scale
  * scoring/apply pass AND cross-checks the training selection itself, with
  * no filesystem dependency left by the time DuckDB runs.
  *
  * Write and read happen in the same JVM invocation (Verify runs queries
  * sequentially, then dumps SQL), so a path relative to the process CWD is
  * stable; later runs (Bench, specs) overwrite the files harmlessly because
  * every consumer reads within its own invocation. */
object OracleAux {

  private def dir: Path = Paths.get("target", "oracle_aux")

  def write(name: String, lines: Seq[String]): Unit = Try {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name + ".txt"), lines.asJava)
  }

  def read(name: String): Option[Seq[String]] = Try {
    val p = dir.resolve(name + ".txt")
    if (Files.exists(p)) Some(Files.readAllLines(p).asScala.toSeq) else None
  }.toOption.flatten

  /** q111's trained linear model, one line per weight: `bias <w>` then
    * `<bucket> <weight>` for every NONZERO coefficient (zero weights
    * contribute exactly 0 to the decimal dot product on both engines, so
    * omitting them changes nothing and keeps the embedded VALUES list
    * small). Doubles go through `Double.toString` — the shortest
    * round-tripping form, which DuckDB's literal parser restores exactly. */
  def writeModel(name: String, m: graft.ext.Classifier.LinearModel): Unit =
    write(name, s"bias ${m.bias}" +:
      m.weights.zipWithIndex.collect {
        case (w, b) if w != 0.0 => s"$b $w"
      }.toSeq)

  def readModel(name: String): Option[(Double, Seq[(Int, Double)])] =
    read(name).flatMap { lines =>
      Try {
        val bias = lines.head.stripPrefix("bias ").toDouble
        val ws = lines.tail.map { l =>
          val Array(b, w) = l.split(" ", 2)
          (b.toInt, w.toDouble)
        }
        (bias, ws)
      }.toOption
    }
}
