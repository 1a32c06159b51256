package graft.etl

import org.apache.hadoop.fs.Path
import graft.SparkSuite

/** The versioned-snapshot sink: pointer-file swap is the only publish
  * step, the previous version survives one generation for in-flight
  * readers, and older versions are purged.
  */
class SnapshotSwapSpec extends SparkSuite {

  test("writeSnapshot: versioned dirs, atomic pointer, one-generation retention") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val pipe = new Pipeline(spark, root)

    assert(pipe.readFlat("t").isEmpty)

    pipe.writeSnapshot(Seq(1, 2, 3).toDF("x"), "t")
    assert(pipe.readFlat("t").get.count() == 3)

    // capture a lazy plan against v_0, then publish v_1 over it
    val inFlight = pipe.readFlat("t").get
    pipe.writeSnapshot(Seq(4, 5).toDF("x"), "t")
    assert(pipe.readFlat("t").get.count() == 2)
    // the in-flight reader still resolves: v_0 was retained
    assert(inFlight.count() == 3)

    // third write purges v_0; v_1 and v_2 remain
    pipe.writeSnapshot(Seq(6).toDF("x"), "t")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new Path(root, "t"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
    assert(versions == Seq("v_1", "v_2"))
    assert(pipe.readFlat("t").get.count() == 1)
  }
}
