"""Spiral PIR server: device-resident KV state + HTTP front end
(reference lib/server/src/bin/server.rs)."""
