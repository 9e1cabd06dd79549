"""Source/sink helpers: replayable file streams (test stand-in for Kafka)
and the Kafka reader wiring itself (no broker in the test environment)."""
