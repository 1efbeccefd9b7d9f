from t_digest_spark.sketches.frequency import BloomFilter, CountMinSketch
from t_digest_spark.sketches.kll import KllSketch

__all__ = ["KllSketch", "CountMinSketch", "BloomFilter"]
