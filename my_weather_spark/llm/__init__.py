from my_weather_spark.llm import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
