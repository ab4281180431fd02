package org.apache.spark.sql.graft

import java.util.Properties

import org.apache.spark.TaskContext
import org.apache.spark.executor.TaskMetrics
import org.apache.spark.memory.TaskMemoryManager
import org.apache.spark.metrics.source.Source
import org.apache.spark.resource.ResourceInformation
import org.apache.spark.shuffle.FetchFailedException
import org.apache.spark.util.{AccumulatorV2, TaskCompletionListener, TaskFailureListener}

/** Test-only TaskContext with inert defaults; subclasses override the
  * member under test (CancelSpec: isInterrupted). Lives in the shim
  * package because TaskContext's abstract surface and
  * setTaskContext/unset are private[spark]. */
abstract class StubTaskContext extends TaskContext {
  override def isCompleted(): Boolean = false
  override def isInterrupted(): Boolean = false
  override def isFailed(): Boolean = false
  override def addTaskCompletionListener(listener: TaskCompletionListener): TaskContext = this
  override def addTaskFailureListener(listener: TaskFailureListener): TaskContext = this
  override def stageId(): Int = 0
  override def stageAttemptNumber(): Int = 0
  override def partitionId(): Int = 0
  override def numPartitions(): Int = 1
  override def attemptNumber(): Int = 0
  override def taskAttemptId(): Long = 0L
  override def getLocalProperty(key: String): String = null
  override def resources(): Map[String, ResourceInformation] = Map.empty
  override def resourcesJMap(): java.util.Map[String, ResourceInformation] =
    new java.util.HashMap()
  override def cpus(): Int = 1
  override def taskMetrics(): TaskMetrics = TaskMetrics.empty
  override def getMetricsSources(sourceName: String): Seq[Source] = Nil
  override private[spark] def killTaskIfInterrupted(): Unit = ()
  override private[spark] def getKillReason(): Option[String] = None
  override private[spark] def taskMemoryManager(): TaskMemoryManager = null
  override private[spark] def registerAccumulator(a: AccumulatorV2[_, _]): Unit = ()
  override private[spark] def setFetchFailed(fetchFailed: FetchFailedException): Unit = ()
  override private[spark] def markInterrupted(reason: String): Unit = ()
  override private[spark] def markTaskFailed(error: Throwable): Unit = ()
  override private[spark] def markTaskCompleted(error: Option[Throwable]): Unit = ()
  override private[spark] def fetchFailed: Option[FetchFailedException] = None
  override private[spark] def getLocalProperties: Properties = new Properties()
  override private[spark] def interruptible(): Boolean = false
  override private[spark] def pendingInterrupt(
      threadToInterrupt: Option[Thread], reason: String): Unit = ()
  override private[spark] def createResourceUninterruptibly[T <: java.io.Closeable](
      resourceBuilder: => T): T = resourceBuilder
}
