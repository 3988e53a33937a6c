"""End-to-end pipelines recasting the reference's walkthrough examples."""
