"""Registry entries — placeholder, filled by build step."""
