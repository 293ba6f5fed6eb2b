"""Drive the engine end-to-end through the public package API."""
import tempfile, json
from dmp_crawler_spark.session import get_spark
from dmp_crawler_spark.corpus import generator
from dmp_crawler_spark.frontier.scheduler import CorpusFetcher, CrawlEngine

spark = get_spark(master="local[8]", app_name="drive")
corpus = tempfile.mkdtemp() + "/pages"
generator.write_pages(spark, 1000, corpus, partitions=8)

seeds = spark.createDataFrame(
    [("http://h0.example.com/article/[1-20].html", "article"),
     ("http://h1.example.com/bbs_post/[1-10].html", "bbs")],
    "seed string, site string")
robots = generator.generate_robots(spark, 1000)
rules = generator.generate_site_rules(spark)

state = tempfile.mkdtemp()
eng = CrawlEngine(spark, state, CorpusFetcher(spark, corpus), rules,
                  robots=robots, respect_robots=True,
                  per_host_budget=5, global_budget=300, n_bloom_shards=8)
eng.init_from_seeds(seeds)
for m in eng.run(max_iters=5):
    print("ITER:", json.dumps(m))
print("CKPT:", json.dumps(eng.last_checkpoint()["metrics"]))
res = eng.results_df()
print("RESULT ROWS:", res.count())
res.orderBy("rowkey").show(5, truncate=60)
crawled = eng.crawled_df()
print("CRAWLED:", crawled.count(), "distinct hosts:", crawled.select("host").distinct().count())
