"""Native (C++) host runtime components, built lazily with the system g++."""
