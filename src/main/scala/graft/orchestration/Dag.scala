package graft.orchestration

import scala.collection.mutable

/** Driver-side DAG orchestrator (reference `orchestration/dag.py:20-244`).
  *
  * Pure control plane — never touches executors (the reference's
  * `dag.py` imports no pyspark either). Kahn topological sort, sequential
  * execution, per-task retries, fail-stop.
  */
object TaskStatus extends Enumeration {
  val Pending, Running, Success, Failed, Skipped = Value
}

final class Task(
    val taskId: String,
    val taskFunction: () => Any,
    val dependencies: Seq[String] = Seq.empty,
    val retries: Int = 0,
    val retryDelaySeconds: Int = 0,
    val description: String = "") {

  var status: TaskStatus.Value = TaskStatus.Pending
  var error: Option[String] = None
  var attempts: Int = 0
  var durationSeconds: Double = 0.0

  def canRun(completed: Set[String]): Boolean =
    dependencies.forall(completed.contains)

  /** Execute with retries (reference `dag.py:70-118`, retry loop
    * `dag.py:104-108` — iterative here instead of recursive). */
  def execute(): TaskResult = {
    var lastError: Option[String] = None
    while (attempts <= retries) {
      status = TaskStatus.Running
      attempts += 1
      val t0 = System.nanoTime()
      try {
        val result = taskFunction()
        durationSeconds = (System.nanoTime() - t0) / 1e9
        status = TaskStatus.Success
        return TaskResult(taskId, "success", durationSeconds, Some(result), None)
      } catch {
        case e: Exception =>
          durationSeconds = (System.nanoTime() - t0) / 1e9
          lastError = Some(e.getMessage)
          if (attempts <= retries && retryDelaySeconds > 0)
            Thread.sleep(retryDelaySeconds * 1000L)
      }
    }
    status = TaskStatus.Failed
    error = lastError
    TaskResult(taskId, "failed", durationSeconds, None, lastError)
  }
}

final case class TaskResult(
    taskId: String, status: String, durationSeconds: Double,
    result: Option[Any], error: Option[String])

final case class DagSummary(
    dagId: String, status: String, totalTasks: Int,
    successfulTasks: Int, failedTasks: Int,
    taskResults: Map[String, TaskResult])

final class Dag(val dagId: String, val description: String = "") {
  private val tasks = mutable.LinkedHashMap.empty[String, Task]

  def addTask(task: Task): Unit = tasks(task.taskId) = task

  /** Kahn topological sort (reference `dag.py:146-181`); throws on cycles
    * or dangling dependencies. */
  def topologicalSort(): Seq[String] = {
    val inDegree = mutable.Map(tasks.keys.map(_ -> 0).toSeq: _*)
    tasks.values.foreach(t => t.dependencies.foreach { dep =>
      if (tasks.contains(dep)) inDegree(t.taskId) += 1
    })
    val queue = mutable.Queue(
      inDegree.collect { case (id, 0) => id }.toSeq.sorted: _*)
    val order = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val id = queue.dequeue()
      order += id
      tasks.values.foreach { t =>
        if (t.dependencies.contains(id)) {
          inDegree(t.taskId) -= 1
          if (inDegree(t.taskId) == 0) queue.enqueue(t.taskId)
        }
      }
    }
    if (order.length != tasks.size)
      throw new IllegalStateException("DAG contains cycles or missing dependencies")
    order.toSeq
  }

  /** Sequential execute with fail-stop (reference `dag.py:183-244`). */
  def execute(): DagSummary = {
    val order = topologicalSort()
    val completed = mutable.Set.empty[String]
    val results = mutable.LinkedHashMap.empty[String, TaskResult]

    val it = order.iterator
    var stopped = false
    while (it.hasNext && !stopped) {
      val id = it.next()
      val task = tasks(id)
      if (!task.canRun(completed.toSet)) {
        task.status = TaskStatus.Failed
        results(id) = TaskResult(id, "failed", 0.0, None,
          Some("Dependencies not met"))
      } else {
        val r = task.execute()
        results(id) = r
        if (r.status == "success") completed += id
        else stopped = true
      }
    }
    val ok = results.values.count(_.status == "success")
    val failed = results.values.count(_.status == "failed")
    DagSummary(dagId, if (failed == 0) "success" else "failed",
      tasks.size, ok, failed, results.toMap)
  }
}
