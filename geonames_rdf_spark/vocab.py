"""RDF vocabulary constants used by the triple-mapping operators.

Mirrors the PREFIX blocks of the reference mapping queries
(``config/places.rq:1-10``, ``config/alternateNames.rq:1-6``,
``config/consolidate.rq:1-5``).
"""

GN = "http://www.geonames.org/ontology#"
WGS84 = "http://www.w3.org/2003/01/geo/wgs84_pos#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
FOAF = "http://xmlns.com/foaf/0.1/"
DCTERMS = "http://purl.org/dc/terms/"
CC = "http://creativecommons.org/ns#"
OWL = "http://www.w3.org/2002/07/owl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
WDT = "http://www.wikidata.org/prop/direct/"

# Deterministic URI bases (reference: places.rq:77-88, alternateNames.rq:31)
SWS = "https://sws.geonames.org/"
WWW = "https://www.geonames.org/"
DBPEDIA = "https://dbpedia.org/resource/"

RDF_TYPE = RDF + "type"
GN_FEATURE = GN + "Feature"
GN_NAME = GN + "name"
GN_COUNTRY_CODE = GN + "countryCode"
GN_FEATURE_CLASS = GN + "featureClass"
GN_FEATURE_CODE = GN + "featureCode"
GN_POPULATION = GN + "population"
GN_LOCATION_MAP = GN + "locationMap"
GN_PARENT_COUNTRY = GN + "parentCountry"
GN_PARENT_ADM1 = GN + "parentADM1"
GN_PARENT_ADM2 = GN + "parentADM2"
GN_PARENT_ADM3 = GN + "parentADM3"
GN_PARENT_ADM4 = GN + "parentADM4"
GN_PARENT_FEATURE = GN + "parentFeature"
GN_CHILDREN_FEATURES = GN + "childrenFeatures"
GN_NEARBY_FEATURES = GN + "nearbyFeatures"
GN_NEIGHBOURING_FEATURES = GN + "neighbouringFeatures"
GN_ALTERNATE_NAME = GN + "alternateName"
GN_POSTAL_CODE = GN + "postalCode"
GN_OFFICIAL_NAME = GN + "officialName"
GN_SHORT_NAME = GN + "shortName"
GN_WIKIPEDIA_ARTICLE = GN + "wikipediaArticle"

WGS84_LAT = WGS84 + "lat"
WGS84_LONG = WGS84 + "long"
WGS84_ALT = WGS84 + "alt"

RDFS_IS_DEFINED_BY = RDFS + "isDefinedBy"
RDFS_SEE_ALSO = RDFS + "seeAlso"

FOAF_DOCUMENT = FOAF + "Document"
FOAF_PRIMARY_TOPIC = FOAF + "primaryTopic"
CC_LICENSE = CC + "license"
CC_ATTRIBUTION_URL = CC + "attributionURL"
CC_ATTRIBUTION_NAME = CC + "attributionName"
DCTERMS_MODIFIED = DCTERMS + "modified"
WDT_P439 = WDT + "P439"  # German municipality key (config/ags-lookup.rq:5-19)

LICENSE_URI = "https://creativecommons.org/licenses/by/4.0/"
ATTRIBUTION_URI = "https://www.geonames.org"

XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DATE = XSD + "date"
XSD_STRING = XSD + "string"
