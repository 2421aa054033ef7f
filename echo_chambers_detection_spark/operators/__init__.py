from echo_chambers_detection_spark.operators.coengagement import coengagement_edges

__all__ = ["coengagement_edges"]
