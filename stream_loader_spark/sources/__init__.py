"""Sources: fixture-table catalog and Kafka-shaped stream views."""
