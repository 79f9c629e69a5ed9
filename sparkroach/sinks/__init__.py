"""Output sinks: the CockroachDB/Postgres JDBC mirror."""
