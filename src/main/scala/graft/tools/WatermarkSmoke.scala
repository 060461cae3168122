package graft.tools

import graft.streaming.Watermarks.FileGlobalWatermarkTracker

/** Child-JVM driver for the cross-process global watermark tracker
  * ([[graft.streaming.Watermarks.FileGlobalWatermarkTracker]]) — each
  * invocation is one REPORTING PROCESS, so the spec's scenarios exercise
  * real multi-JVM coordination through the shared directory (the
  * deployment shape of the reference's ZK tracker: many consumers, one
  * coordination root).
  *
  * Modes: `report <dir> <staleMs> <process> <v1,v2,...>` (update each
  * value in order, print the global after each) and
  * `finish <dir> <staleMs> <process>`.
  */
object WatermarkSmoke {
  def main(args: Array[String]): Unit = {
    val tracker = new FileGlobalWatermarkTracker(args(1), args(2).toLong)
    args(0) match {
      case "report" =>
        args(4).split(',').map(_.toLong).foreach { v =>
          tracker.update(args(3), v)
          println(s"WM ${args(3)} reported $v global=${tracker.globalWatermark}")
        }
      case "finish" =>
        tracker.finished(args(3))
        println(s"WM ${args(3)} finished global=${tracker.globalWatermark}")
      case other => sys.error(s"unknown mode $other")
    }
  }
}
