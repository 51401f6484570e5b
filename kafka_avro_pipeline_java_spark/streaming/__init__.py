from . import avro_codec, kafka_io, sink

__all__ = ["avro_codec", "kafka_io", "sink"]
