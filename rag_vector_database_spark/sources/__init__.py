"""Source connectors mirroring SURVEY.md section 2 #1-9."""
