package graft.oracle

import graft.core.{Extract, Robots, UrlCanon}
import graft.corpus.CorpusGen
import graft.model.Outcome
import graft.operators.{CrawlConfig, FrontierStep}

import scala.collection.mutable

/**
 * Sequential golden oracle (SURVEY.md §5.4): a direct single-threaded Scala
 * reimplementation of the reference's task-resolution semantics
 * (worker/src/worker.rs:58-172) under the BSP/single-logical-worker FIFO
 * ordering formalised in SURVEY.md §7.6 — NO Spark. It shares every pure
 * function (canonicalizer, extractor, robots, corpus generator, priority
 * hash) with the engine, so "equal (url → generation) map + equal final
 * seen-set + equal per-URL outcome" is checkable exactly.
 */
object SeqCrawler {

  final case class OracleResult(
      /** url → generation first enqueued (seeds = 0). */
      seenGen: Map[String, Int],
      /** (gen-fetched-at, url, outcome, error_kind), in fetch order. */
      outcomes: Seq[(Int, String, String, String)])

  private final case class OTask(
      url: String, host: String, priority: Int, nextFetch: Long,
      retryCount: Int, gen: Int)

  def crawl(cfg: CrawlConfig, seeds: Seq[String], maxGens: Int = 50): OracleResult = {
    val robotsMap: Map[String, Seq[String]] =
      if (cfg.useRobots)
        CorpusGen.robotsTable(cfg.corpus).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      else Map.empty
    // robots Crawl-delay per host (politeness windows) + the per-host open
    // delay window — mirrors the engine's delays df + host_next table
    val delays: Map[String, Int] =
      if (cfg.useRobots) CorpusGen.delayTable(cfg.corpus).toMap else Map.empty
    val hostNext = mutable.Map.empty[String, Long]

    val seenGen = mutable.LinkedHashMap.empty[String, Int]
    val outcomes = Seq.newBuilder[(Int, String, String, String)]

    var frontier: Vector[OTask] = seeds
      .flatMap(UrlCanon.canonicalize).distinct
      .map(u => OTask(u, UrlCanon.hostOf(u), 0, 0L, 0, 0)).toVector
    frontier.foreach(t => seenGen(t.url) = 0)

    var gen = 0
    while (gen < maxGens && frontier.nonEmpty) {
      // retro-blacklist retraction: forget matching hosts' seen entries at
      // the start of this fetch generation (mirrors CrawlLoop's purge +
      // cuckoo delete); rediscovered URLs re-enter with a fresh generation
      cfg.retractHosts.get(gen).foreach { subs =>
        val victims = seenGen.keysIterator
          .filter(u => subs.exists(UrlCanon.hostOf(u).contains)).toVector
        victims.foreach(seenGen.remove)
      }

      // O1: per-host priority-queue cap — top-k by (priority, next_fetch,
      // url). Crawl-delay semantics: a task whose next_fetch generation
      // hasn't arrived is ineligible; a delayed host's effective cap is 1
      // (one fetch per politeness window ⇒ ≤1 URL per d generations).
      val (selected, deferred) = {
        val byHost = frontier.groupBy(_.host)
        val sel = mutable.ArrayBuffer.empty[OTask]
        val defe = mutable.ArrayBuffer.empty[OTask]
        byHost.toSeq.sortBy(_._1).foreach { case (host, ts) =>
          val sorted = ts.sortBy(t => (t.priority, t.nextFetch, t.url))
          val (eligible, ineligible) = sorted.partition(_.nextFetch <= gen.toLong)
          val cap = if (delays.getOrElse(host, 0) >= 1) 1 else cfg.perHostCap
          sel ++= eligible.take(cap)
          defe ++= eligible.drop(cap) ++ ineligible
        }
        (sel.toVector, defe.toVector)
      }

      // global generation budget (FrontierStep.CrawlConfig.genBudget): keep
      // the best `budget` selected tasks across ALL hosts by the same
      // deterministic queue key; the rest defer and re-compete next gen
      val (budgeted, overBudget) =
        if (cfg.genBudget > 0 && selected.size > cfg.genBudget) {
          val b = math.min(cfg.genBudget, Int.MaxValue).toInt
          val ordered = selected.sortBy(t => (t.priority, t.nextFetch, t.url))
          (ordered.take(b), ordered.drop(b))
        } else (selected, Vector.empty[OTask])

      // fetch + extract, accumulating this generation's candidate links
      val candidates = mutable.LinkedHashSet.empty[String]
      budgeted.sortBy(t => (t.host, t.priority, t.nextFetch, t.url)).foreach { t =>
        CorpusGen.resolvePage(cfg.corpus, t.url) match {
          case CorpusGen.PageLookup.Found(h, p) =>
            outcomes += ((gen, t.url, Outcome.Ok, ""))
            val links = Extract.linksFromSpans(t.url, CorpusGen.pageSpans(cfg.corpus, h, p))
            links.flatMap(UrlCanon.canonicalize)
              .filter(u => UrlCanon.hostOf(u).nonEmpty)
              .foreach(candidates += _)
          case CorpusGen.PageLookup.NotFound =>
            outcomes += ((gen, t.url, Outcome.Err, "InvalidPage"))
          case CorpusGen.PageLookup.Unreachable =>
            outcomes += ((gen, t.url, Outcome.Reject, "NetworkError"))
        }
      }

      // F2/F3 + robots + J1 cull vs seen
      val discovered = candidates.iterator
        .filter(u => cfg.filter.keep(UrlCanon.hostOf(u)))
        .filter(u => !cfg.useRobots ||
          Robots.allowed(robotsMap.getOrElse(UrlCanon.hostOf(u), Nil), u))
        .filterNot(seenGen.contains)
        .toVector

      discovered.foreach(u => seenGen(u) = gen + 1)

      val newTasks = discovered.map { u =>
        OTask(u, UrlCanon.hostOf(u), FrontierStep.priorityOf(u), 0L, 0, gen + 1)
      }
      // O2: observed reference behaviour — rejects NOT requeued
      // (rmqredis.rs:243-249; cfg.requeueRejects mirrors the engine flag)
      val requeued =
        if (cfg.requeueRejects)
          budgeted.filter(t => CorpusGen.resolvePage(cfg.corpus, t.url) ==
              CorpusGen.PageLookup.Unreachable)
            .filter(_.retryCount < cfg.maxRetries)
            .map(t => t.copy(retryCount = t.retryCount + 1))
        else Vector.empty

      // crawl-delay bookkeeping, mirroring the engine: hosts fetched this
      // generation with delay d close their window until gen + d, dropped
      // once stale; every next-frontier task is stamped with its host's
      // open window (max with its own next_fetch)
      hostNext.filterInPlace((_, nf) => nf > gen.toLong)
      budgeted.iterator.map(_.host).distinct.foreach { h =>
        delays.get(h).filter(_ >= 1).foreach(d => hostNext(h) = gen.toLong + d)
      }
      frontier = (newTasks ++ deferred ++ overBudget ++ requeued).map(t =>
        t.copy(nextFetch = math.max(t.nextFetch, hostNext.getOrElse(t.host, 0L))))
      gen += 1
    }
    OracleResult(seenGen.toMap, outcomes.result())
  }
}
