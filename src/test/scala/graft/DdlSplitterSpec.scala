package graft

import graft.sources.DdlSplitter
import org.scalatest.funsuite.AnyFunSuite

/** Goldens per FIXTURES.md §C: CREATE TABLE with KEY/UNIQUE/FULLTEXT×2/
  * SPATIAL/CONSTRAINT/auto-inc-leading index → (create, alters,
  * constraints) triple (reference split: common.c:1440-1508). */
class DdlSplitterSpec extends AnyFunSuite {

  val ddl: String =
    """CREATE TABLE `film` (
      |  `film_id` smallint unsigned NOT NULL AUTO_INCREMENT,
      |  `title` varchar(128) NOT NULL,
      |  `description` text,
      |  `store_id` tinyint unsigned NOT NULL,
      |  `location` geometry NOT NULL,
      |  PRIMARY KEY (`film_id`),
      |  KEY `idx_title` (`title`),
      |  KEY `idx_film_id_title` (`film_id`,`title`),
      |  UNIQUE KEY `uq_title_store` (`title`,`store_id`),
      |  FULLTEXT KEY `ft_desc` (`description`),
      |  FULLTEXT KEY `ft_title` (`title`),
      |  SPATIAL KEY `sp_loc` (`location`),
      |  CONSTRAINT `fk_store` FOREIGN KEY (`store_id`) REFERENCES `store` (`store_id`)
      |) ENGINE=InnoDB""".stripMargin

  test("indexes move to ALTERs, constraints batch separately, auto-inc-leading key stays") {
    val s = DdlSplitter.split(ddl, batchSize = 2)
    // bare create keeps: PK, the auto-inc-leading secondary key, columns
    assert(s.create.contains("PRIMARY KEY (`film_id`)"))
    assert(s.create.contains("KEY `idx_film_id_title`"))
    assert(!s.create.contains("idx_title`,"))
    assert(!s.create.contains("FULLTEXT"))
    assert(!s.create.contains("SPATIAL"))
    assert(!s.create.contains("CONSTRAINT"))
    // 5 moved indexes, batch size 2 → 3 ALTERs
    assert(s.indexAlters.length === 3)
    assert(s.indexAlters.head.startsWith("ALTER TABLE `film` ADD "))
    assert(s.indexAlters.flatMap(a => "ADD ".r.findAllIn(a)).size === 5)
    assert(s.constraintAlters.length === 1)
    assert(s.constraintAlters.head.contains("ADD CONSTRAINT `fk_store`"))
  }

  test("create remains syntactically sane (no dangling comma)") {
    val s = DdlSplitter.split(ddl)
    val beforeParen = s.create.split("\n").reverse
      .dropWhile(l => !l.trim.startsWith(")")).drop(1)
      .dropWhile(_.trim.isEmpty).headOption.getOrElse("")
    assert(!beforeParen.trim.endsWith(","), s"dangling comma in:\n${s.create}")
  }

  test("at most one FULLTEXT per ALTER; batchSize 0 = unlimited (common.c:1464-1480)") {
    // reference default batchsize is 0 (common.c:41): everything in one
    // ALTER except the fulltext split
    val s = DdlSplitter.split(ddl)
    assert(s.indexAlters.length === 2) // [idx_title, uq, ft_desc] [ft_title, sp_loc] — split at 2nd FULLTEXT
    s.indexAlters.foreach { a =>
      assert("FULLTEXT".r.findAllIn(a).size <= 1,
        s"two FULLTEXT keys in one ALTER:\n$a")
    }
    assert(s.indexAlters.flatMap(a => "ADD ".r.findAllIn(a)).size === 5)
    // batched mode also respects the fulltext cap
    val b2 = DdlSplitter.split(ddl, batchSize = 2)
    b2.indexAlters.foreach(a => assert("FULLTEXT".r.findAllIn(a).size <= 1))
  }

  test("engine extraction and optimize-keys gating (common.c:1495-1504, common_options.c:210)") {
    val s = DdlSplitter.split(ddl)
    assert(s.engine === Some("InnoDB"))
    assert(DdlSplitter.optimizeEligible(s))
    val myisam = DdlSplitter.split(ddl.replace("ENGINE=InnoDB", "ENGINE=MyISAM"))
    assert(myisam.engine === Some("MyISAM"))
    assert(!DdlSplitter.optimizeEligible(myisam))
    // rocksdb is in the default list, case-insensitively
    assert(DdlSplitter.optimizeEligible(
      DdlSplitter.split(ddl.replace("ENGINE=InnoDB", "ENGINE=RocksDB"))))
    // SKIP mode: keys stay in the CREATE
    val skip = DdlSplitter.split(ddl, splitIndexes = false)
    assert(skip.indexAlters.isEmpty)
    assert(skip.create.contains("FULLTEXT KEY `ft_desc`"))
    // constraints still split (the reference moves CONSTRAINT regardless
    // of split_indexes, common.c:1481-1486)
    assert(skip.constraintAlters.nonEmpty)
  }

  test("table without secondary indexes passes through") {
    val simple = "CREATE TABLE `t` (\n  `id` int NOT NULL,\n  PRIMARY KEY (`id`)\n) ENGINE=InnoDB"
    val s = DdlSplitter.split(simple)
    assert(s.create === simple)
    assert(s.indexAlters.isEmpty && s.constraintAlters.isEmpty)
  }
}
