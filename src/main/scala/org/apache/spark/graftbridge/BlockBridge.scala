package org.apache.spark.graftbridge

import org.apache.spark.SparkContext
import org.apache.spark.storage.RDDBlockId

/** Bridge into `private[spark]` storage APIs (BlockManagerMaster), placed
  * under an `org.apache.spark` subpackage the same way Spark's own
  * extensions do it.
  *
  * Why it exists (ADVICE r11): the driver's `getRDDStorageInfo` /
  * `getPersistentRDDs` views enumerate the `persistentRdds` map, which
  * `unpersist` clears SYNCHRONOUSLY regardless of the `blocking` flag —
  * so a "blocks are gone after release" assertion built on them is
  * vacuous, and a cached-blocks metric built on them reads 0 in the
  * exact async-removal-lag failure mode it exists to evidence. These
  * helpers ask the BlockManagerMaster for ACTUAL block state (with
  * `askStorageEndpoints = true`, a live round-trip to the storage
  * endpoints, not the driver's bookkeeping).
  */
object BlockBridge {

  /** All RDD blocks currently held by any block manager — the
    * storage-endpoint truth, not the `persistentRdds` projection. */
  def rddBlocks(sc: SparkContext): Seq[RDDBlockId] =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isRDD, askStorageEndpoints = true)
      .collect { case b: RDDBlockId => b }

  /** RDD blocks belonging to the given RDD ids (e.g. ids captured from
    * `Ckpt.localScoped` before a release, to assert the release actually
    * dropped them). */
  def rddBlocksFor(sc: SparkContext, rddIds: Set[Int]): Seq[RDDBlockId] =
    rddBlocks(sc).filter(b => rddIds.contains(b.rddId))

  /** Storage memory in use across all block managers (max − remaining),
    * in bytes — the flat-memory evidence stream for the blocking-release
    * contract that heap-used alone can't carry (heap also holds
    * execution and GC-garbage). */
  def storageMemoryUsed(sc: SparkContext): Long =
    sc.env.blockManager.master.getMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum

  /** Drain the async listener bus — lets a measurement listener
    * ([[graft.ProbeJobs]]) read complete job/stage records right after an
    * action returns, instead of racing event delivery. Dev-probe only. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
