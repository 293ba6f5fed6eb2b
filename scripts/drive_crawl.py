"""Drive the engine end-to-end through the public package API."""
import tempfile, json
from dmp_crawler_spark.session import get_spark
from dmp_crawler_spark.corpus import generator, templates
from dmp_crawler_spark.frontier.scheduler import CorpusFetcher, CrawlEngine

spark = get_spark(master="local[8]", app_name="drive")
N = 1000
corpus = tempfile.mkdtemp() + "/pages"
generator.write_pages(spark, N, corpus, partitions=8)

# seeds derived from the corpus mapping (robust to archetype-list changes):
# 8 real page URLs + one S1 range template anchored on a real page (the
# range's out-of-corpus neighbours exercise the fetch-failure path)
anchor = 3
seed_rows = [(templates.url_for(i * 97 % N, N), "") for i in range(8)]
arch = templates.archetype_for(anchor)
host = templates.host_for(anchor, N)
seed_rows.append((f"http://{host}/{arch}/[{max(0, anchor - 2)}-{anchor + 2}].html", arch))
seeds = spark.createDataFrame(seed_rows, "seed string, site string")
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
