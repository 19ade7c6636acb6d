package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TileFunctions._

/** Tile expiry (reference: src/expire-tiles.cpp, src/expire-output.cpp):
  * compute the set of dirty web-map tiles touched by changed geometries,
  * then roll the set up to lower zooms.
  *
  * The reference accumulates an `unordered_set<quadkey>` per process;
  * here the dirty set is a DataFrame and dedup is a hash aggregate —
  * distributed, spillable, no per-process caps needed (the reference
  * caps at 10M tiles/geometry, 50M overall purely to bound RAM;
  * src/expire-output.hpp:24-25).
  */
object Expire {

  /** Dirty tiles at `zoom` for a set of points (lon/lat degree columns).
    * Point cover is one tile; the buffer option of the reference
    * (expire-config.hpp) becomes a neighborhood explode if needed.
    * Dedup = `distinct` (map-side combine). */
  def pointCover(df: DataFrame, lon: Column, lat: Column, zoom: Int): DataFrame =
    df.select(tileX(lon, zoom).as("x"), tileY(lat, zoom).as("y"))
      .distinct()
      .withColumn("zoom", lit(zoom))

  /** Zoom roll-up (expire_output_t::output_tiles_to_*,
    * src/expire-output.cpp:60-150): emit each dirty tile and its parents
    * down to `minZoom`, deduplicated. The reference walks sorted
    * quadkeys to dedup "only once"; a distinct over (zoom, x>>k, y>>k)
    * is the set-at-a-time equivalent. */
  def rollup(tiles: DataFrame, x: String, y: String, fromZoom: Int,
      minZoom: Int): DataFrame =
    tiles
      .select(explode(sequence(lit(minZoom), lit(fromZoom))).as("zoom"),
        col(x), col(y))
      .select(col("zoom"),
        zoomOut(col(x), fromZoom, col("zoom")).as("x"),
        zoomOut(col(y), fromZoom, col("zoom")).as("y"))
      .distinct()

  /** Tile-list output row format of osm2pgsql-expire: one line
    * `zoom/x/y` (src/expire-output.cpp:60-90). */
  def formatTiles(tiles: DataFrame): DataFrame =
    tiles.select(concat_ws("/", col("zoom"), col("x"), col("y")).as("tile"))

  /** Expire-table DDL (expire_output_t::create_output_table,
    * src/expire-output.cpp:143-155): (zoom, x, y) primary key plus
    * first/last touch timestamps. */
  def tableDdl(table: String): String =
    s"""CREATE TABLE IF NOT EXISTS $table (
       | zoom int4 NOT NULL,
       | x int4 NOT NULL,
       | y int4 NOT NULL,
       | first timestamp with time zone DEFAULT CURRENT_TIMESTAMP(0),
       | last timestamp with time zone DEFAULT CURRENT_TIMESTAMP(0),
       | PRIMARY KEY (zoom, x, y))""".stripMargin

  /** Per-tile upsert (output_tiles_to_table,
    * src/expire-output.cpp:107-141): the legacy 3-column table inserts
    * once and ignores conflicts; the 5-column format bumps `last` on
    * re-expiry. Use from a foreachPartition JDBC writer. */
  def tableUpsertSql(table: String, legacyThreeColumn: Boolean): String =
    if (legacyThreeColumn)
      s"INSERT INTO $table (zoom, x, y)" +
        " VALUES ($1::int4, $2::int4, $3::int4) ON CONFLICT DO NOTHING"
    else
      s"INSERT INTO $table (zoom, x, y)" +
        " VALUES ($1::int4, $2::int4, $3::int4)" +
        " ON CONFLICT (zoom, x, y) DO UPDATE SET last = CURRENT_TIMESTAMP(0)"
}
