package graft.core

import graft.TestBase
import org.apache.spark.ml.{Estimator, Transformer, PipelineStage}
import org.apache.spark.ml.param.ParamMap
import java.io.File
import java.lang.reflect.Modifier

/** Reflection-based fuzzing meta-test (ref: core/src/test/scala/.../core/
  * test/fuzzing/Fuzzing.scala:29-298 + FuzzingTest.scala): every concrete
  * PipelineStage in the library is discovered from the classpath and
  * automatically checked — instantiable, param-copy round-trips, and
  * REFERENCED from at least one test source file. A new stage with no
  * test coverage fails this suite; nothing can silently skip.
  */
class FuzzingSuite extends TestBase {

  /** All concrete graft PipelineStage classes, discovered from compiled
    * class files (works under sbt where classes live in target/). */
  private lazy val stageClasses: Seq[Class[_]] = {
    val roots = System.getProperty("java.class.path").split(File.pathSeparator)
      .filter(p => p.endsWith("classes") && p.contains("target"))
      .map(new File(_)).filter(_.isDirectory)
    def walk(dir: File, prefix: String): Seq[String] = {
      val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      fs.flatMap { f =>
        if (f.isDirectory) walk(f, s"$prefix${f.getName}.")
        else if (f.getName.endsWith(".class") && !f.getName.contains("$"))
          Seq(prefix + f.getName.stripSuffix(".class"))
        else Seq.empty
      }
    }
    val names = roots.flatMap(r => walk(new File(r, "graft"), "graft."))
    names.distinct.sorted.flatMap { n =>
      val c = try Class.forName(n) catch { case _: Throwable => null }
      if (c != null && classOf[PipelineStage].isAssignableFrom(c) &&
        !Modifier.isAbstract(c.getModifiers)) Seq(c)
      else Seq.empty
    }.toSeq
  }

  private def instantiate(c: Class[_]): Option[PipelineStage] =
    try Some(c.getConstructor().newInstance().asInstanceOf[PipelineStage])
    catch { case _: NoSuchMethodException => None } // model classes: fitted only

  test("stage census is non-trivial") {
    assert(stageClasses.size >= 50,
      s"expected a full library, found only ${stageClasses.size} stages")
    val transformers = stageClasses.count(classOf[Transformer].isAssignableFrom)
    val estimators = stageClasses.count(classOf[Estimator[_]].isAssignableFrom)
    info(s"discovered ${stageClasses.size} stages " +
      s"($transformers transformers, $estimators estimators)")
    assert(transformers > 0 && estimators > 0)
  }

  test("every default-constructible stage copies with params intact") {
    val failures = stageClasses.flatMap { c =>
      instantiate(c).flatMap { stage =>
        try {
          val copied = stage.copy(ParamMap.empty)
          val mismatched = stage.params.filter { p =>
            stage.get(p).map {
              case a: Array[_] => a.toSeq
              case v => v
            } != copied.get(copied.getParam(p.name)).map {
              case a: Array[_] => a.toSeq
              case v => v
            }
          }
          if (copied.uid != stage.uid)
            Some(s"${c.getName}: uid changed on copy")
          else if (mismatched.nonEmpty)
            Some(s"${c.getName}: params lost on copy: ${mismatched.map(_.name).mkString(",")}")
          else None
        } catch {
          case e: Throwable => Some(s"${c.getName}: copy threw ${e.getClass.getSimpleName}")
        }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every default-constructible stage explains its params") {
    val failures = stageClasses.flatMap { c =>
      instantiate(c).flatMap { stage =>
        try { stage.explainParams(); None }
        catch { case e: Throwable =>
          Some(s"${c.getName}: explainParams threw ${e.getClass.getSimpleName}") }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every stage is referenced by at least one test source") {
    val testRoot = new File("src/test/scala")
    assume(testRoot.isDirectory, "test sources not on disk; skipping")
    def sources(dir: File): Seq[File] = {
      val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      fs.flatMap(f => if (f.isDirectory) sources(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Seq.empty)
    }
    val corpus = sources(testRoot)
      .filterNot(_.getName == "FuzzingSuite.scala") // self-references don't count
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
    val uncovered = stageClasses.map(_.getSimpleName).distinct.filterNot { name =>
      corpus.exists(_.contains(name))
    }
    assert(uncovered.isEmpty,
      s"stages with NO test coverage (add a spec): ${uncovered.mkString(", ")}")
  }

  test("every stage is MLWritable with an MLReadable companion — no exemptions") {
    // the reference makes every stage ComplexParamsWritable and fuzzes
    // save/load across the board (Fuzzing.scala:222-298); mirror that:
    // a stage that cannot sit in a persisted Pipeline is a bug, and this
    // test is what stops a new stage shipping without persistence
    import org.apache.spark.ml.util.{MLWritable, MLReadable}
    val notWritable = stageClasses
      .filterNot(classOf[MLWritable].isAssignableFrom)
    assert(notWritable.isEmpty,
      s"stages without save(): ${notWritable.map(_.getSimpleName).mkString(", ")}")
    val noReader = stageClasses.filterNot { c =>
      try {
        val companion = Class.forName(c.getName + "$")
        classOf[MLReadable[_]].isAssignableFrom(companion)
      } catch { case _: Throwable => false }
    }
    assert(noReader.isEmpty,
      s"stages without a load() companion: ${noReader.map(_.getSimpleName).mkString(", ")}")
  }

  test("every MLWritable fitted model is loadable and round-trip tested") {
    // fitted models can't be fuzz-instantiated, but persistence is still
    // enforced mechanically: an MLWritable Model must have an MLReadable
    // companion (save without load is a trap) and must appear in
    // SerializationSuite, whose tests do the actual fit→save→load→compare
    import org.apache.spark.ml.util.{MLWritable, MLReadable}
    val models = stageClasses.filter { c =>
      classOf[org.apache.spark.ml.Model[_]].isAssignableFrom(c) &&
        classOf[MLWritable].isAssignableFrom(c)
    }
    assert(models.nonEmpty, "expected MLWritable fitted models in the library")
    val noReader = models.filterNot { c =>
      try {
        val companion = Class.forName(c.getName + "$")
        classOf[MLReadable[_]].isAssignableFrom(companion)
      } catch { case _: Throwable => false }
    }
    assert(noReader.isEmpty,
      s"MLWritable models with NO MLReadable companion: ${noReader.map(_.getSimpleName).mkString(", ")}")
    val serSuite = new File("src/test/scala/graft/core/SerializationSuite.scala")
    assume(serSuite.isFile, "test sources not on disk; skipping")
    val serSrc = new String(java.nio.file.Files.readAllBytes(serSuite.toPath))
    val untested = models.map(_.getSimpleName).distinct
      .filterNot(serSrc.contains)
    assert(untested.isEmpty,
      s"MLWritable models missing a SerializationSuite round-trip: ${untested.mkString(", ")}")
  }

  test("every MLWritable default-constructible stage save/load round-trips") {
    import org.apache.spark.ml.util.{MLWritable, MLReadable}
    import org.apache.spark.ml.param._
    spark.range(1).count() // ml save/load needs an active session
    // fitted Model shells have no state to save — SerializationSuite
    // round-trips them post-fit; here we fuzz the params-only stages,
    // SETTING a synthesized value on every unset simple param first so a
    // writer that silently drops values cannot pass (the reference's
    // SerializationFuzzing idea, Fuzzing.scala:222-298)
    def fuzzParams(stage: PipelineStage): Seq[String] =
      stage.params.toSeq.flatMap { p =>
        if (stage.get(p).isDefined) Seq.empty
        else {
          // a candidate per TYPED param class; validators (gt(0), inArray)
          // may reject — that param is then simply left unset. Generic
          // Param[T] is skipped: erasure would let a String land in e.g.
          // Param[DataFrame => DataFrame], leaving the stage type-invalid
          // and making the lost-value check vacuous for complex params
          // (those are exercised by SerializationSuite's explicit cases).
          val candidates: Seq[Any] = p match {
            case _: IntParam => Seq(7)
            case _: LongParam => Seq(7L)
            case _: DoubleParam => Seq(0.5)
            case _: BooleanParam => Seq(true)
            case _: StringArrayParam => Seq(Array("fuzz_a", "fuzz_b"))
            // these two ride GraftWritable's complex.bin — fuzzing them
            // exercises the Java-serialized path generically
            case _: IntArrayParam => Seq(Array(7, 8))
            case _: DoubleArrayParam => Seq(Array(0.5, 1.5))
            case _ => Seq.empty
          }
          candidates.flatMap { v =>
            try {
              stage.set(p.asInstanceOf[Param[Any]], v)
              // some validators only fire via hasParam/validate on set;
              // double-check the value actually stuck
              if (stage.get(p).contains(v)) Seq(p.name) else Seq.empty
            } catch { case _: Throwable => Seq.empty }
          }.headOption.toSeq
        }
      }
    def norm(v: Any): Any = v match {
      case a: Array[_] => a.toSeq
      case x => x
    }
    val candidates = stageClasses
      .filterNot(classOf[org.apache.spark.ml.Model[_]].isAssignableFrom)
    val failures = candidates.flatMap { c =>
      instantiate(c) match {
        case Some(stage: MLWritable) =>
          try {
            val fuzzed = fuzzParams(stage)
            val dir = java.nio.file.Files
              .createTempDirectory(s"fuzz-${c.getSimpleName}").toString + "/m"
            stage.write.overwrite().save(dir)
            // every save must emit Spark's standard metadata file, or the
            // stage can't sit in a persisted Pipeline (Pipeline.load
            // dispatches from $path/metadata) — mechanical gate so no
            // future hand-written writer regresses this silently
            val metaDir = new File(dir, "metadata")
            val hasPart = metaDir.isFile ||
              Option(metaDir.listFiles()).exists(_.exists(f =>
                f.isFile && f.getName.startsWith("part-")))
            require(hasPart,
              "save() did not write a readable standard Spark metadata file")
            val companion = Class.forName(c.getName + "$")
            val module = companion.getField("MODULE$").get(null)
            module match {
              case r: MLReadable[_] =>
                val loaded = r.load(dir).asInstanceOf[PipelineStage]
                val lost = fuzzed.filter { name =>
                  val orig = stage.get(stage.getParam(name)).map(norm)
                  val back = try loaded.get(loaded.getParam(name)).map(norm)
                    catch { case _: Throwable => None }
                  orig != back
                }
                if (loaded.uid != stage.uid)
                  Some(s"${c.getName}: uid lost in save/load")
                else if (lost.nonEmpty)
                  Some(s"${c.getName}: param values lost in save/load: ${lost.mkString(",")}")
                else None
              case _ => None
            }
          } catch {
            case e: Throwable =>
              Some(s"${c.getName}: save/load threw ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        case _ => None
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
