package graft.tools
import java.sql.Timestamp
import java.time.Duration
import graft.model._
import graft.registry.Registry
object RegProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    args(1) match {
      case "write" =>
        val reg = new Registry(Some(path))
        reg.applyEntity(Entity("user", GraftType.Int64, Some("user_id")))
        reg.applyFeatureView(FeatureView("v", Seq("user"),
          Seq(Feature("f", GraftType.Dbl)), Duration.ofHours(1),
          FileSource("/root/testdata/sf0.001/events.parquet", "ts")))
        println("WROTE " + path)
      case "read" =>
        val reg = new Registry(Some(path))
        println("VIEWS=" + reg.listFeatureViews.map(_.name).mkString(","))
        println("TTL=" + reg.getFeatureView("v").ttl)
        println("JOINKEY=" + reg.getEntity("user").joinKey)
    }
  }
}
