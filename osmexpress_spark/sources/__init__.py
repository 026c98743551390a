from . import osc, osm_xml, pbf, sink

__all__ = ["osc", "osm_xml", "pbf", "sink"]
