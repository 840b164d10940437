"""Source adapters: framed-Avro Kafka model, file/rate test sources."""
