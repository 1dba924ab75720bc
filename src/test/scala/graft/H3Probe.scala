package graft
import graft.index.{H3, H3Geo}
object H3Probe {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val sf = H3Geo.latLngToCell(37.3615593, -122.0553238, 5)
    println(f"init+anchor ok in ${(System.nanoTime()-t0)/1e6}%.0f ms: ${java.lang.Long.toHexString(sf)}")
    println("SF res9:   " + java.lang.Long.toHexString(H3Geo.latLngToCell(37.775938728915946, -122.41795063018799, 9)))
    println("center sf5: " + H3Geo.cellToLatLng(sf))
    val la6 = java.lang.Long.parseUnsignedLong("862749967ffffff", 16)
    println("ref cell 862749967ffffff center: " + H3Geo.cellToLatLng(la6) + " valid=" + H3.isValidCell(la6))
    val la12 = java.lang.Long.parseUnsignedLong("8c274996e1683ff", 16)
    println("ref cell 8c274996e1683ff center: " + H3Geo.cellToLatLng(la12))
    println("npole res0: " + java.lang.Long.toHexString(H3Geo.latLngToCell(90,0,0)))
    println("spole res0: " + java.lang.Long.toHexString(H3Geo.latLngToCell(-90,0,0)))
    println("disk1 sf5: " + H3Geo.gridDisk(sf, 1).map(java.lang.Long.toHexString).mkString(","))
    println("boundary sf5: " + H3Geo.cellBoundary(sf).map{case(a,b)=>f"($a%.6f,$b%.6f)"}.mkString(" "))
  }
}
