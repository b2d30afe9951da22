"""Source connectors: Kafka (S1/S2), CDC envelopes (S3), files/sockets
(S5), in-memory rows (S6)."""
