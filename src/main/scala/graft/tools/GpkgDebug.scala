package graft.tools
import graft.geometry._
object GpkgDebug {
  def main(args: Array[String]): Unit = {
    val path = "/root/repo/src/test/resources/fixture.gpkg"
    val rows = Sqlite.scanTable(path, Sqlite.master(path).find(_.name=="plots").get.rootPage)
    println("first rows:")
    rows.take(3).foreach { case (rid, vals) =>
      println(s"rowid=$rid " + vals.map(v => if (v==null) "null" else s"${v.getClass.getSimpleName}:${v.toString.take(20)}").mkString(" | "))
    }
    println("row 1234+1:")
    rows.filter(_._1 == 1235).foreach { case (rid, vals) =>
      println(s"rowid=$rid " + vals.map(v => if (v==null) "null" else s"${v.getClass.getSimpleName}:len${v.toString.length}").mkString(" | "))
    }
    val mixed = rows.map(_._2(3)).filter(_ != null).map(_.getClass.getSimpleName).distinct
    println("value col types: " + mixed)
  }
}
