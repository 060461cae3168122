package graft.plans

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** Physical-plan skeleton renderer shared by the batch
  * (PlanStabilitySpec) and streaming (StreamingPlanStabilitySpec)
  * golden specs: one line per meaningful node. Join strategy, build
  * side, exchange partitioning CLASS (not width), TakeOrdered limit,
  * scan output width and codegen span boundaries are signal; expression
  * IDs, paths, stats and partition counts are noise.
  */
object PlanSkeleton {

  def label(p: SparkPlan): Option[String] = p match {
    case _: WholeStageCodegenExec => Some("WholeStageCodegen")
    case _: InputAdapter => None // transparent codegen boundary wrapper
    case _: ReusedExchangeExec => Some("ReusedExchange")
    case j: SortMergeJoinExec => Some(s"SortMergeJoin ${j.joinType}")
    case j: BroadcastHashJoinExec =>
      Some(s"BroadcastHashJoin ${j.joinType} build=${j.buildSide}")
    case j: ShuffledHashJoinExec =>
      Some(s"ShuffledHashJoin ${j.joinType} build=${j.buildSide}")
    case j: BroadcastNestedLoopJoinExec =>
      Some(s"BroadcastNestedLoopJoin ${j.joinType}")
    case _: CartesianProductExec => Some("CartesianProduct")
    case e: ShuffleExchangeExec =>
      Some("Exchange " +
        e.outputPartitioning.getClass.getSimpleName.stripSuffix("$"))
    case _: BroadcastExchangeExec => Some("BroadcastExchange")
    case t: TakeOrderedAndProjectExec =>
      Some(s"TakeOrderedAndProject limit=${t.limit}")
    case s: FileSourceScanExec => Some(s"ScanParquet cols=${s.output.size}")
    case other =>
      Some(other.nodeName.replaceAll("\\s*\\(\\d+\\)", "").trim)
  }

  def skeleton(p: SparkPlan, depth: Int = 0,
      out: StringBuilder = new StringBuilder): String = {
    label(p) match {
      case Some(l) =>
        out.append("  " * depth).append(l).append('\n')
        p.children.foreach(c => skeleton(c, depth + 1, out))
      case None =>
        p.children.foreach(c => skeleton(c, depth, out))
    }
    out.toString
  }
}
