package graft

import org.scalatest.funsuite.AnyFunSuite

/** Loads dags/graft_aw_dag.py through tools/check_dag.py: the DAG file is
  * executed (against a minimal Airflow stub, since Airflow isn't a build
  * dependency) and must produce the reference topology — five parallel
  * dimension tasks fanning into etl_fato_vendas, each task a spark-submit
  * of `AwRun --table <name>` (reference README.md:113 ordering contract).
  */
class DagSpec extends AnyFunSuite {
  test("graft_aw_dag.py loads and has the 5-dims-then-fato topology") {
    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
      l => out.append(l).append('\n'))
    val code = Process(Seq("python3", "tools/check_dag.py"),
      new java.io.File(sys.props.getOrElse("user.dir", "."))).!(logger)
    assert(code === 0, s"check_dag.py failed:\n$out")
    assert(out.toString.contains("dag ok"), out.toString)
  }
}
