package org.apache.spark.sql.graftshim

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.util.collection.ExternalSorter

/** Access to Spark's `private[spark]` [[ExternalSorter]] — the
  * task-memory-manager-accounted, disk-spilling sort the shuffle machinery
  * itself uses. [[graft.plans.TopKPerKeyExec]] falls back to it when a
  * partition's distinct-key count exceeds the in-memory heap budget: the
  * sorter grows under memory accounting and SPILLS under pressure, exactly
  * like the window-sort plan the operator replaces, so the fallback can
  * never OOM where the window form would have spilled. */
object SpillSorter {

  /** Sort `rows` by `ord` with accounted, spillable state. Rows must be
    * defensive copies (the iterator is buffered across the sort); the
    * returned iterator is valid until task completion (cleanup is hooked
    * on the task-completion callback). */
  def sorted(rows: Iterator[UnsafeRow], ord: Ordering[InternalRow])
      : Iterator[UnsafeRow] = {
    val ctx = TaskContext.get()
    val sorter = new ExternalSorter[UnsafeRow, Null, Null](
      ctx, aggregator = None, partitioner = None,
      ordering = Some(ord.asInstanceOf[Ordering[UnsafeRow]]))
    sorter.insertAll(rows.map(r => (r, null)))
    if (ctx != null)
      ctx.addTaskCompletionListener[Unit](_ => sorter.stop())
    sorter.iterator.map(_._1)
  }
}
