package graft

import java.nio.file.Files
import graft.sqlfront.GraftSession

/** End-to-end feature demo mirroring the reference's demo-ecommerce.sh
  * (reference kv/DemoScriptFeaturesTest.java): one realistic script from
  * DDL through inserts, joins+aggregation, views, matviews, update/delete,
  * and introspection — through the session's single sql() entry point.
  */
class DemoScriptSpec extends SparkSpec {

  test("e-commerce demo script runs end to end") {
    val s = new GraftSession(spark, Files.createTempDirectory("graft_demo"))
    s.sql("""
      CREATE TYPE status AS ENUM ('active', 'banned');
      CREATE TABLE users (
        user_id SERIAL PRIMARY KEY,
        email TEXT UNIQUE NOT NULL,
        st status DEFAULT 'active');
      CREATE TABLE products (
        product_id SERIAL PRIMARY KEY,
        name TEXT NOT NULL,
        category TEXT,
        price DOUBLE);
      CREATE TABLE reviews (
        review_id SERIAL PRIMARY KEY,
        product_id INT REFERENCES products(product_id),
        user_id INT REFERENCES users(user_id),
        rating INT,
        body TEXT);
      INSERT INTO users (email) VALUES ('a@x.com'), ('b@x.com'), ('c@x.com');
      INSERT INTO products (name, category, price) VALUES
        ('kb', 'periph', 49.0), ('mouse', 'periph', 29.0), ('mon', 'display', 199.0);
      INSERT INTO reviews (product_id, user_id, rating, body) VALUES
        (1, 1, 5, 'great'), (1, 2, 4, 'good'), (2, 1, 3, 'ok'), (3, 3, 5, 'sharp');
      DO $$ BEGIN NULL; END $$;
    """)
    // the reference demo's headline query: categories by review volume
    val top = s.sql("""
      SELECT p.category, COUNT(r.review_id) AS review_count,
             CAST(AVG(CAST(r.rating AS DOUBLE)) AS DOUBLE) AS avg_rating
      FROM products p LEFT JOIN reviews r ON p.product_id = r.product_id
      GROUP BY p.category
      HAVING COUNT(r.review_id) > 0
      ORDER BY review_count DESC, p.category""").collect()
    assert(top.length == 2)
    assert(top(0).getString(0) == "periph" && top(0).getLong(1) == 3)

    s.sql("CREATE VIEW five_star AS SELECT * FROM reviews WHERE rating = 5; " +
      "CREATE MATERIALIZED VIEW cat_stats AS " +
      "SELECT category, COUNT(*) AS n FROM products GROUP BY category")
    assert(s.sql("SELECT count(*) AS c FROM five_star").collect()(0).getLong(0) == 2)

    s.sql("UPDATE products SET price = price * 0.9 WHERE category = 'periph'; " +
      "DELETE FROM reviews WHERE rating < 4")
    assert(s.sql("SELECT CAST(min(price) AS DOUBLE) AS p FROM products")
      .collect()(0).getDouble(0) == 29.0 * 0.9)
    assert(s.sql("SELECT count(*) AS c FROM reviews").collect()(0).getLong(0) == 3)

    // matview stale until refresh; catalog introspection sees everything
    s.sql("INSERT INTO products (name, category, price) VALUES ('cam', 'video', 89.0)")
    assert(s.sql("SELECT sum(n) AS t FROM cat_stats").collect()(0).getLong(0) == 3)
    s.sql("REFRESH MATERIALIZED VIEW cat_stats")
    assert(s.sql("SELECT sum(n) AS t FROM cat_stats").collect()(0).getLong(0) == 4)
    val kinds = s.sql("SHOW TABLES").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kinds("users") == "table" && kinds("five_star") == "view" &&
      kinds("cat_stats") == "matview" && kinds("status") == "enum")

    // --- round-7 surfaces, same session -------------------------------
    // CTAS + SELECT INTO
    s.sql("CREATE TABLE price_report AS " +
      "SELECT category, CAST(avg(price) AS DOUBLE) AS avg_price FROM products GROUP BY category")
    assert(s.sql("SELECT count(*) AS c FROM price_report").collect()(0).getLong(0) == 3L)
    s.sql("SELECT name, price INTO expensive FROM products WHERE price > 100")
    assert(s.sql("SELECT name FROM expensive").collect().map(_.getString(0)).toSeq == Seq("mon"))
    // INSERT ... DEFAULT VALUES: serial id, enum default
    s.sql("INSERT INTO users (email) VALUES ('d@x.com')")
    s.sql("CREATE TABLE counters (id SERIAL PRIMARY KEY, n INT DEFAULT 7)")
    s.sql("INSERT INTO counters DEFAULT VALUES; INSERT INTO counters DEFAULT VALUES")
    val cs = s.sql("SELECT id, n FROM counters ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(cs == Seq((1, 7), (2, 7)))
    // join DML: price adjustment driven by a source table
    s.sql("CREATE TABLE adj (category TEXT PRIMARY KEY, factor DOUBLE)")
    s.sql("INSERT INTO adj VALUES ('video', 0.5)")
    s.sql("UPDATE products SET price = price * adj.factor FROM adj " +
      "WHERE products.category = adj.category")
    assert(s.sql("SELECT CAST(price AS DOUBLE) AS p FROM products WHERE name = 'cam'")
      .collect()(0).getDouble(0) == 44.5)
    s.sql("DELETE FROM reviews USING products " +
      "WHERE reviews.product_id = products.product_id AND products.category = 'display'")
    assert(s.sql("SELECT count(*) AS c FROM reviews").collect()(0).getLong(0) == 2L)
    // statistics + retention maintenance
    s.sql("ANALYZE products")
    assert(s.tableStats("products").exists(_._2 == 4L))
    val vac = s.sql("VACUUM products").collect()(0)
    assert(vac.getString(0) == "VACUUM" && vac.getLong(1) >= 1L) // superseded versions pruned
    assert(s.sql("SELECT count(*) AS c FROM products").collect()(0).getLong(0) == 4L)
  }
}
